"""The PEP 561 marker + top-level stub stay in lockstep with the runtime.

Parity target: the reference ships python/blazeseq/py.typed and
python/blazeseq/__init__.pyi for its binding surface. mypy is not available
in this environment, so instead of a type-check run these tests parse the
stub with ast and assert it covers exactly the runtime export surface —
a stale stub fails here before it can mislead a downstream type checker.
"""

import ast
import pathlib

import blazeseq_tpu as bt

PKG = pathlib.Path(bt.__file__).parent


def _stub_names():
    tree = ast.parse((PKG / "__init__.pyi").read_text())
    names = set()
    for node in tree.body:
        if isinstance(node, ast.ImportFrom):
            if node.module in ("types", "typing"):
                continue  # stub-internal helper imports, not re-exports
            for a in node.names:
                names.add(a.asname or a.name)
        elif isinstance(node, ast.AnnAssign) and isinstance(
                node.target, ast.Name):
            names.add(node.target.id)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
            names.add(node.name)
    return {n for n in names if not n.startswith("_")}


def _runtime_names():
    import types

    # vars(bt) accumulates submodule attributes as OTHER tests import them
    # (importing blazeseq_tpu.report binds bt.report, etc.), so filter
    # module objects generically instead of by a list that goes stale
    names = {n for n, v in vars(bt).items()
             if not n.startswith("_") and not isinstance(v, types.ModuleType)}
    # lazy __getattr__ modules are part of the public surface
    names |= {"ops", "parallel", "models"}
    return names


def test_py_typed_marker_exists():
    assert (PKG / "py.typed").is_file()


def test_stub_covers_runtime_exports():
    missing = _runtime_names() - _stub_names()
    assert not missing, f"stub is missing runtime exports: {sorted(missing)}"


def test_stub_has_no_phantom_exports():
    phantom = _stub_names() - _runtime_names()
    assert not phantom, f"stub exports absent at runtime: {sorted(phantom)}"


def test_stub_names_resolve():
    for name in sorted(_stub_names()):
        assert getattr(bt, name, None) is not None, name

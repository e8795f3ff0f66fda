"""Pallas-NW default dispatch: auto-selected on TPU backends, bit-equal to
the lax.scan formulation. The equality leg runs only when a real TPU is
attached (the test suite pins JAX_PLATFORMS=cpu, where dispatch must pick
the scan path)."""

import numpy as np
import pytest


def test_dispatch_prefers_scan_off_tpu():
    import jax

    from blazeseq_tpu.ops import nw

    if "tpu" in jax.devices()[0].platform.lower():
        pytest.skip("TPU attached: covered by the equality test")
    assert not nw._on_tpu()


def test_pallas_equals_xla_on_tpu():
    import jax
    import jax.numpy as jnp

    from blazeseq_tpu.ops import nw

    if not nw._on_tpu():
        pytest.skip("no TPU backend attached")
    rng = np.random.default_rng(0)
    B, L = 512, 48
    seq = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                 size=(B, L)))
    lens = jnp.asarray(rng.integers(1, L + 1, B), dtype=jnp.int32)
    ref = jnp.asarray(rng.choice(np.frombuffer(b"ACGT", np.uint8), size=40))
    s_auto = np.asarray(nw.nw_scores(seq, lens, ref))  # Pallas by default
    s_xla = np.asarray(nw.nw_scores(seq, lens, ref, prefer_pallas=False))
    assert np.array_equal(s_auto, s_xla)

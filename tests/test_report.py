"""HTML QC report renderer (blazeseq_tpu/report.py) + CLI --html."""

import re
import subprocess
import sys
from html.parser import HTMLParser

import numpy as np
import pytest

pytest.importorskip("jax")

import blazeseq_tpu as bt
from blazeseq_tpu.models.qc import QCModel
from blazeseq_tpu.report import render_html, write_html


class _Balance(HTMLParser):
    VOID = {"meta", "br", "hr", "img", "input", "line", "rect", "circle",
            "path", "link"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.stack = []
        self.errors = []

    def handle_starttag(self, tag, attrs):
        if tag not in self.VOID:
            self.stack.append(tag)

    def handle_endtag(self, tag):
        if tag in self.VOID:
            return
        if not self.stack or self.stack[-1] != tag:
            self.errors.append((tag, self.getpos()))
        else:
            self.stack.pop()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("rep") / "r.fastq"
    p.write_bytes(bytes(bt.generate_synthetic_fastq_buffer(
        3000, 60, 110, 2, 40, "sanger")))
    return str(p)


def test_render_html_structure(corpus):
    rep = QCModel(quality_schema="sanger",
                  adapters=[b"AGATCGGAAGAG"]).run_file(corpus)
    doc = render_html(rep, title="t")
    assert doc.startswith("<!doctype html>")
    assert "NaN" not in doc and "Infinity" not in doc
    assert 'width="-' not in doc and 'height="-' not in doc
    b = _Balance()
    b.feed(doc)
    assert b.errors == [] and b.stack == []
    # panels: quality line, composition (5 series + legend), qual hist,
    # GC dist, length dist, mean-qual dist (the adapter panel drops when
    # the adapter never occurs — zero-trimmed series)
    assert doc.count('<section class="panel"') >= 6
    assert "Per-position base composition" in doc
    assert doc.count("<details>") >= 6  # table view per panel (relief rule)
    # stat tiles carry the scalars
    for k in ("reads", "bases", "GC %", "mean Q"):
        assert k in doc
    # hover layer present on line charts
    assert doc.count("hoverdata") >= 3


def test_adapter_panel_when_adapter_occurs(tmp_path):
    ad = b"AGATCGGAAGAG"
    recs = []
    for i in range(64):
        seq = b"ACGT" * 10 + ad + b"TTGCA" * 4
        recs.append(b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
    p = tmp_path / "ad.fastq"
    p.write_bytes(b"".join(recs))
    rep = QCModel(quality_schema="sanger", adapters=[ad]).run_file(str(p))
    doc = render_html(rep)
    assert "Adapter content" in doc


def test_render_from_dict_roundtrip(corpus):
    rep = QCModel(quality_schema="sanger").run_file(corpus)
    doc = render_html(rep.to_dict())
    assert "Per-position base composition" in doc
    assert "Read length distribution" in doc


def test_write_html_and_counts(tmp_path, corpus):
    rep = QCModel(quality_schema="sanger").run_file(corpus)
    out = tmp_path / "rep.html"
    write_html(rep, str(out))
    doc = out.read_text()
    # the reads tile shows the exact count (report numbers are not rounded
    # away below 10k)
    assert re.search(r">3000<", doc)


def test_cli_stats_html(tmp_path, corpus):
    out = tmp_path / "cli.html"
    r = subprocess.run(
        [sys.executable, "-m", "blazeseq_tpu", "stats", "--html", str(out),
         corpus],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert out.exists() and "<svg" in out.read_text()


def test_per_pos_composition_sums(corpus):
    rep = QCModel(quality_schema="sanger").run_file(corpus)
    ppb = np.asarray(rep.per_pos_base_counts)
    ppc = np.asarray(rep.per_pos_count)
    assert ppb.shape[0] == 5 and ppb.shape[1] == ppc.shape[0]
    assert np.array_equal(ppb.sum(axis=0), ppc)
    d = rep.to_dict()
    assert np.array_equal(np.asarray(d["per_pos_base_counts"]).sum(axis=0),
                          np.asarray(d["per_pos_count"]))

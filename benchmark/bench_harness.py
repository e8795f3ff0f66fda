#!/usr/bin/env python
"""Benchmark orchestrator (≡ reference benchmark/fastq-parser/bench.py +
run_benchmarks.sh).

Workloads:
  parser        wall-clock subprocess timing of the counting runner over a
                generated plain FASTQ corpus, per mode, with warmup + reps
                (hyperfine-style; uses `taskset -c 0` pinning when available)
  gzip          same over a gzip corpus with ParallelGzipReader (parallelism 4
                and 1)
  throughput    in-process modes x validation matrix (no subprocess overhead)
  fasta         FASTA counting over a generated corpus

Every cell's `records base_pairs` output is cross-checked for agreement
(reference bench.py:113-156). Results are written to
benchmark/results/<workload>.json; plot with benchmark/plot_results.py.

Usage: python benchmark/bench_harness.py --workload parser --size-mb 512
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS_DIR = os.path.join(REPO, "benchmark", "results")


def _corpus_dir() -> str:
    """RAM-backed corpus dir (reference methodology: corpora on ramfs/tmpfs,
    benchmark/README.md:185-194). BENCH_DIR overrides."""
    d = os.environ.get("BENCH_DIR")
    if d:
        return d
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        return "/dev/shm"
    return "/tmp"


def _gen_fastq(size_mb: int, read_len: int = 100) -> str:
    import blazeseq_tpu as bt

    path = os.path.join(_corpus_dir(),
                        "bench_corpus_%dmb_%dbp.fastq" % (size_mb, read_len))
    if not os.path.exists(path):
        n = bt.compute_num_reads_for_size(size_mb << 20, read_len, read_len)
        buf = bt.generate_synthetic_fastq_buffer(n, read_len, read_len, 2, 40,
                                                 "sanger")
        with open(path, "wb") as f:
            f.write(buf)
    return path


def _gen_fastq_gz(size_mb: int) -> str:
    import zlib

    plain = _gen_fastq(size_mb)
    path = plain + ".gz"
    if not os.path.exists(path):
        comp = zlib.compressobj(6, zlib.DEFLATED, 31)
        with open(plain, "rb") as src, open(path, "wb") as dst:
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                dst.write(comp.compress(chunk))
            dst.write(comp.flush())
    return path


def _gen_fasta(size_mb: int) -> str:
    import blazeseq_tpu as bt

    path = os.path.join(_corpus_dir(), "bench_corpus_%dmb.fasta" % size_mb)
    if not os.path.exists(path):
        n = bt.compute_num_fasta_reads_for_size(size_mb << 20, 1000, 3000)
        buf = bt.generate_synthetic_fasta_buffer(n, 1000, 3000)
        with open(path, "wb") as f:
            f.write(buf)
    return path


def _pin_prefix():
    if shutil.which("taskset"):
        return ["taskset", "-c", "0"]
    return []


def _build_native_runner(name: str = "run_fastq_native") -> str:
    """Build a compiled counting runner over the native scan engine (the
    compiled-vs-compiled head-to-head column; role of the reference's
    compiled Mojo runners, benchmark/fastq-parser/run_blazeseq.mojo and
    benchmark/fasta-parser/run_blazeseq_fasta.mojo)."""
    src = os.path.join(REPO, "benchmark", "runners", name + ".cpp")
    engines = [os.path.join(REPO, "blazeseq_tpu", "native", "scan.cpp")]
    if name == "run_fastq_native":  # gzip mode links the inflate core
        engines.append(os.path.join(REPO, "blazeseq_tpu", "native",
                                    "pinflate.cpp"))
    out = os.path.join(_corpus_dir(), name)
    newest = max(os.path.getmtime(p) for p in [src] + engines)
    if os.path.exists(out) and os.path.getmtime(out) >= newest:
        return out
    if shutil.which("g++"):
        r = subprocess.run(["g++", "-O3", "-march=native", "-o", out, src]
                           + engines + ["-lz"], capture_output=True)
        if r.returncode == 0:
            return out
    return ""


def _build_competitor(name: str = "kseq_class_runner") -> str:
    """Build a same-host C baseline (reference methodology: cross-parser
    head-to-head with enforced count agreement,
    /root/reference/benchmark/fastq-parser/bench.py:113-156). Returns the
    binary path or '' when no C compiler is available."""
    src = os.path.join(REPO, "benchmark", "competitors", name + ".c")
    out = os.path.join(_corpus_dir(), name)
    if (os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)):
        return out
    for cc in ("gcc", "cc", "clang"):
        if shutil.which(cc):
            r = subprocess.run([cc, "-O2", "-o", out, src, "-lz"],
                               capture_output=True)
            if r.returncode == 0:
                return out
    return ""


def _runner_env():
    """Environment for host-only runner subprocesses: drop device-tunnel
    autoregistration triggers (some dev hosts hook sitecustomize to register
    an accelerator backend on EVERY interpreter start, adding seconds of
    startup the runner never uses)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _time_subprocess(cmd, warmup=1, reps=3, timed_output=False):
    """hyperfine-style: warmup runs then reps, return (times, stdout).

    timed_output: the runner prints `records base_pairs seconds` — the
    third field is its in-runner parse time (interpreter startup excluded);
    returns (wall_times, "records base_pairs", inner_times)."""
    out = None
    env = _runner_env()
    inner = []

    def _split(stdout):
        parts = stdout.strip().split()
        if timed_output:
            return " ".join(parts[:2]), float(parts[2])
        return " ".join(parts), None

    for _ in range(warmup):
        r = subprocess.run(cmd, capture_output=True, text=True, check=True,
                           env=env)
        out, _ = _split(r.stdout)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = subprocess.run(cmd, capture_output=True, text=True, check=True,
                           env=env)
        times.append(time.perf_counter() - t0)
        o, secs = _split(r.stdout)
        assert o == out, "nondeterministic runner output"
        if secs is not None:
            inner.append(secs)
    if timed_output:
        return times, out, inner
    return times, out


def _record(workload, rows, corpus_size):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    path = os.path.join(RESULTS_DIR, "%s.json" % workload)
    with open(path, "w") as f:
        json.dump({"workload": workload, "corpus_bytes": corpus_size,
                   "rows": rows}, f, indent=2)
    print("wrote %s" % path)


def _check_agreement(rows):
    counts = {(r["records"], r["base_pairs"]) for r in rows}
    if len(counts) != 1:
        raise SystemExit("FATAL: records/base_pairs disagree across runners: %s"
                         % counts)
    print("cross-check OK: all runners agree on %s records / %s base_pairs"
          % counts.pop())


def workload_parser(size_mb, reps):
    corpus = _gen_fastq(size_mb)
    size = os.path.getsize(corpus)
    runner = os.path.join(REPO, "benchmark", "runners", "run_fastq.py")
    rows = []
    for mode in ["count", "padded", "batch", "records"]:
        cmd = _pin_prefix() + [sys.executable, runner, corpus, "--mode",
                               mode, "--time"]
        times, out, inner = _time_subprocess(cmd, reps=reps,
                                             timed_output=True)
        records, bases = map(int, out.split())
        mean = sum(times) / len(times)
        # headline gbps from in-runner parse time: interpreter startup
        # (~0.15s) would otherwise fabricate regressions on sub-second
        # corpora relative to the in-process throughput matrix
        rows.append(dict(mode=mode, mean_s=mean, min_s=min(times),
                         times=times, parse_s=min(inner),
                         parse_times=inner,
                         gbps=size / min(inner) / 1e9,
                         wall_gbps=size / min(times) / 1e9,
                         records=records, base_pairs=bases))
        print("parser/%s: parse %.3fs (%.2f GB/s) | wall %.3fs (%.2f GB/s "
              "incl. interpreter startup)"
              % (mode, min(inner), size / min(inner) / 1e9,
                 min(times), size / min(times) / 1e9))
    native = _build_native_runner()
    if native:
        for flag, name in ((["--validate"], "native_count_validated"),
                           ([], "native_count")):
            times, out = _time_subprocess(
                _pin_prefix() + [native, corpus] + flag, reps=reps)
            records, bases = map(int, out.split())
            rows.append(dict(mode=name, mean_s=sum(times) / len(times),
                             min_s=min(times), times=times,
                             gbps=size / min(times) / 1e9,
                             records=records, base_pairs=bases))
            print("parser/%s: %.3fs (%.2f GB/s)"
                  % (name, min(times), size / min(times) / 1e9))
    for cname, label in (("kseq_real_runner", "kseq_real"),
                         ("kseq_class_runner", "kseq_class_c"),
                         ("seqio_class_runner", "seqio_class_c")):
        comp = _build_competitor(cname)
        if not comp:
            continue
        times, out = _time_subprocess(_pin_prefix() + [comp, corpus],
                                      reps=reps)
        records, bases = map(int, out.split())
        rows.append(dict(mode=label, mean_s=sum(times) / len(times),
                         min_s=min(times), times=times,
                         gbps=size / min(times) / 1e9,
                         records=records, base_pairs=bases))
        print("parser/%s: %.3fs (%.2f GB/s)"
              % (label, min(times), size / min(times) / 1e9))
    _check_agreement(rows)
    _record("parser", rows, size)


def workload_gzip(size_mb, reps):
    corpus = _gen_fastq_gz(size_mb)
    plain_size = os.path.getsize(_gen_fastq(size_mb))
    runner = os.path.join(REPO, "benchmark", "runners", "run_fastq.py")
    rows = []
    for par in [4, 1]:
        cmd = _pin_prefix() + [sys.executable, runner, corpus,
                               "--mode", "count", "--parallelism", str(par),
                               "--time"]
        times, out, inner = _time_subprocess(cmd, reps=reps,
                                             timed_output=True)
        records, bases = map(int, out.split())
        rows.append(dict(mode="gzip_p%d" % par, mean_s=sum(times) / len(times),
                         min_s=min(times), times=times, parse_s=min(inner),
                         gbps=plain_size / min(inner) / 1e9,
                         wall_gbps=plain_size / min(times) / 1e9,
                         records=records, base_pairs=bases))
        print("gzip/p%d: parse %.3fs | wall %.3fs" % (par, min(inner),
                                                      min(times)))
    native = _build_native_runner()
    if native:
        times, out = _time_subprocess(_pin_prefix() + [native, corpus],
                                      reps=reps)
        records, bases = map(int, out.split())
        rows.append(dict(mode="native_gz_count",
                         mean_s=sum(times) / len(times), min_s=min(times),
                         times=times, gbps=plain_size / min(times) / 1e9,
                         records=records, base_pairs=bases))
        print("gzip/native_gz_count: %.3fs" % min(times))
    for cname, label in (("kseq_real_runner", "kseq_real_gz"),
                         ("kseq_class_runner", "kseq_class_c_gz")):
        comp = _build_competitor(cname)
        if not comp:
            continue
        times, out = _time_subprocess(_pin_prefix() + [comp, corpus],
                                      reps=reps)
        records, bases = map(int, out.split())
        rows.append(dict(mode=label,
                         mean_s=sum(times) / len(times), min_s=min(times),
                         times=times, gbps=plain_size / min(times) / 1e9,
                         records=records, base_pairs=bases))
        print("gzip/%s: %.3fs" % (label, min(times)))
    _check_agreement(rows)
    _record("gzip", rows, plain_size)


def workload_throughput(size_mb, reps):
    corpus = _gen_fastq(size_mb)
    size = os.path.getsize(corpus)
    runner = os.path.join(REPO, "benchmark", "throughput", "run_throughput.py")
    r = subprocess.run(
        _pin_prefix() + [sys.executable, runner, corpus,
                         "--reps", str(reps)],
        capture_output=True, text=True, check=True, env=_runner_env())
    rows = []
    for line in r.stdout.strip().splitlines():
        mode, val, secs, gbps, records, bases = line.split()
        rows.append(dict(mode=mode, validation=val, parse_seconds=float(secs),
                         gbps=float(gbps), records=int(records),
                         base_pairs=int(bases)))
        print("throughput/%s/%s: %s GB/s" % (mode, val, gbps))
    _check_agreement(rows)
    _record("throughput", rows, size)


def workload_fasta(size_mb, reps):
    corpus = _gen_fasta(size_mb)
    size = os.path.getsize(corpus)
    runner = os.path.join(REPO, "benchmark", "runners", "run_fasta.py")
    times, out = _time_subprocess(
        _pin_prefix() + [sys.executable, runner, corpus], reps=reps)
    records, bases = map(int, out.split())
    rows = [dict(mode="fasta", mean_s=sum(times) / len(times),
                 min_s=min(times), times=times,
                 gbps=size / min(times) / 1e9, records=records,
                 base_pairs=bases)]
    print("fasta: %.3fs (%.2f GB/s)" % (min(times), rows[0]["gbps"]))
    native = _build_native_runner("run_fasta_native")
    if native:
        try:
            times, out = _time_subprocess(_pin_prefix() + [native, corpus],
                                          reps=reps)
        except subprocess.CalledProcessError:
            times, out = None, None  # fast accounting declined this file
        if out is not None:
            records, bases = map(int, out.split())
            rows.append(dict(mode="fasta_native_count",
                             mean_s=sum(times) / len(times),
                             min_s=min(times), times=times,
                             gbps=size / min(times) / 1e9,
                             records=records, base_pairs=bases))
            print("fasta_native_count: %.3fs (%.2f GB/s)"
                  % (min(times), rows[-1]["gbps"]))
    comp = _build_competitor("kseq_real_runner")
    if comp:
        # the real upstream kseq parses FASTA too (quality-less records)
        times, out = _time_subprocess(_pin_prefix() + [comp, corpus],
                                      reps=reps)
        records, bases = map(int, out.split())
        rows.append(dict(mode="kseq_real_fasta",
                         mean_s=sum(times) / len(times), min_s=min(times),
                         times=times, gbps=size / min(times) / 1e9,
                         records=records, base_pairs=bases))
        print("fasta/kseq_real: %.3fs (%.2f GB/s)"
              % (min(times), rows[-1]["gbps"]))
    _check_agreement(rows)
    _record("fasta", rows, size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="throughput",
                    choices=["parser", "gzip", "throughput", "fasta", "all"])
    ap.add_argument("--size-mb", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    loads = (["parser", "gzip", "throughput", "fasta"]
             if args.workload == "all" else [args.workload])
    for w in loads:
        globals()["workload_" + w](args.size_mb, args.reps)


if __name__ == "__main__":
    main()

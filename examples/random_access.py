#!/usr/bin/env python
"""FASTQ random access, plain and compressed — the workflow the reference
leaves open ("end-to-end, no seek": reference README.md:129-134,
docs/TODO.md:5-8).

Generates a corpus, writes it twice (plain and BGZF via BGZFWriter), builds
a `.fqi` sidecar over each, then:

  * fetches arbitrary record ranges from both — the BGZF index stores
    htslib-style virtual offsets, so a fetch into the compressed file costs
    one seek + at most one block of skipped inflate output;
  * cuts the corpus into record-aligned shards with `shard_records` (the
    format-agnostic sharding API) and streams one shard from each file,
    proving plain and compressed agree record-for-record.

Usage: python examples/random_access.py [N_RECORDS]
"""

import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import blazeseq_tpu as bt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    buf = bytes(bt.generate_variable_id_fastq_buffer(
        n, 40, 150, 2, 40, "sanger", seed=42))
    d = tempfile.mkdtemp(prefix="bt_random_access_")
    plain = os.path.join(d, "reads.fastq")
    bgzf = os.path.join(d, "reads.fastq.gz")
    with open(plain, "wb") as f:
        f.write(buf)
    w = bt.BGZFWriter(bgzf)
    w.write(buf)
    w.close()
    print("corpus: %d records, %.1f MB plain, %.1f MB BGZF"
          % (n, len(buf) / 1e6, os.path.getsize(bgzf) / 1e6))

    coffs, _, total_u = bt.scan_bgzf_blocks(bgzf)
    print("BGZF block table: %d blocks, %d decompressed bytes "
          "(header-only scan)" % (len(coffs), total_u))

    with bt.IndexedFastq(plain, stride=512) as ixp, \
            bt.IndexedFastq(bgzf, stride=512) as ixg:
        print("indexed: %d records each; sidecars %s / %s"
              % (len(ixp), os.path.basename(plain) + ".fqi",
                 os.path.basename(bgzf) + ".fqi"))

        mid = n // 2
        for label, ix in [("plain", ixp), ("bgzf ", ixg)]:
            recs = ix.fetch(mid, 3)
            print("%s fetch(%d, 3): %s"
                  % (label, mid, [r.id().split()[0] for r in recs]))
        assert [r.sequence_bytes() for r in ixp.fetch(mid, 3)] == \
               [r.sequence_bytes() for r in ixg.fetch(mid, 3)]

        shards = ixg.shard_records(8)
        print("shard_records(8): %s" % (shards,))
        start, count = shards[len(shards) // 2]
        a = [r.id_bytes() for r in ixp.stream_records(start, count)]
        b = [r.id_bytes() for r in ixg.stream_records(start, count)]
        assert a == b and len(a) == count
        print("streamed shard (%d, %d): %d records, plain == bgzf "
              "record-for-record" % (start, count, count))
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

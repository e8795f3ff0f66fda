/* Counting runner over the REAL upstream kseq.h (third_party/kseq.h —
 * verbatim MIT-licensed Heng Li parser; see third_party/README.md for
 * provenance). Prints `records base_pairs` like every runner in the
 * harness so the cross-parser agreement check applies (reference
 * methodology: benchmark/fastq-parser/bench.py:113-156 upstream).
 *
 * gzopen reads plain files transparently, so the same binary serves the
 * plain-FASTQ, gzip-FASTQ, and FASTA workloads (kseq parses both record
 * shapes). This runner file is original to this repo; only kseq.h is
 * third-party. */
#include <stdint.h>
#include <stdio.h>
#include <zlib.h>

#include "third_party/kseq.h"
KSEQ_INIT(gzFile, gzread)

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s FILE[.gz]\n", argv[0]);
    return 2;
  }
  gzFile fp = gzopen(argv[1], "r");
  if (!fp) {
    perror("gzopen");
    return 1;
  }
  (void)gzbuffer(fp, 1u << 20);
  kseq_t* seq = kseq_init(fp);
  int64_t records = 0, bases = 0;
  int r;
  while ((r = kseq_read(seq)) >= 0) {
    records++;
    bases += (int64_t)seq->seq.l;
  }
  kseq_destroy(seq);
  gzclose(fp);
  if (r != -1) { /* -1 = clean EOF; -2 = truncated quality, etc. */
    fprintf(stderr, "kseq parse error: %d\n", r);
    return 1;
  }
  printf("%lld %lld\n", (long long)records, (long long)bases);
  return 0;
}

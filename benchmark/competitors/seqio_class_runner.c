/*
 * Independent seq_io-class FASTQ counting baseline.
 *
 * A stronger same-host competitor than the kseq-class runner: zero-copy
 * single-buffer parsing in the style of Rust's seq_io / needletail — a
 * large reusable buffer, memchr-driven line splitting directly in the
 * buffer (no per-record allocation or copying), compact-and-refill when a
 * record straddles the buffer end. Single-line FASTQ only (the fast path
 * those libraries optimize; multi-line files are rejected), plain files
 * only. Prints "records base_pairs".
 *
 * This is an independent implementation of the algorithmic class, written
 * from the format semantics — no third-party source is vendored.
 *
 * Build: gcc -O2 -o seqio_class_runner seqio_class_runner.c
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define BUF_SZ (4 * 1024 * 1024)

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "Usage: seqio_class_runner <path.fastq>\n");
        return 1;
    }
    FILE *fp = fopen(argv[1], "rb");
    if (!fp) { fprintf(stderr, "open failed\n"); return 1; }
    unsigned char *buf = (unsigned char *)malloc(BUF_SZ);
    size_t have = 0;   /* valid bytes in buf */
    size_t pos = 0;    /* parse cursor */
    int eof = 0;
    long long records = 0, base_pairs = 0;

    for (;;) {
        /* refill: move the unconsumed tail to the front, top up */
        if (!eof) {
            if (pos > 0) {
                memmove(buf, buf + pos, have - pos);
                have -= pos;
                pos = 0;
            }
            size_t n = fread(buf + have, 1, BUF_SZ - have, fp);
            if (n == 0) eof = 1;
            have += n;
        }
        if (pos >= have) break;

        /* parse complete records in [pos, have) */
        int progressed = 0;
        while (pos < have) {
            unsigned char *base = buf + pos;
            size_t rem = have - pos;
            unsigned char *e1 = memchr(base, '\n', rem);
            if (!e1) break;
            unsigned char *s = e1 + 1;
            unsigned char *e2 = memchr(s, '\n', (size_t)(buf + have - s));
            if (!e2) break;
            unsigned char *p = e2 + 1;
            if (p >= buf + have) break;
            unsigned char *e3 = memchr(p, '\n', (size_t)(buf + have - p));
            if (!e3) break;
            unsigned char *q = e3 + 1;
            unsigned char *e4 = memchr(q, '\n', (size_t)(buf + have - q));
            if (!e4) {
                if (!eof) break;
                e4 = buf + have; /* final record without trailing newline */
            }
            if (base[0] != '@' || p[0] != '+') {
                fprintf(stderr, "malformed record near byte %zu\n", pos);
                return 1;
            }
            long long seq_len = (long long)(e2 - s);
            long long qual_len = (long long)(e4 - q);
            if (seq_len != qual_len) {
                fprintf(stderr, "seq/qual length mismatch\n");
                return 1;
            }
            records++;
            base_pairs += seq_len;
            pos = (size_t)(e4 - buf) + (e4 < buf + have ? 1 : 0);
            progressed = 1;
            if (pos >= have) break;
        }
        if (eof && !progressed) {
            if (pos < have) {
                fprintf(stderr, "truncated trailing record\n");
                return 1;
            }
            break;
        }
        if (eof && pos >= have) break;
        if (!eof && !progressed && have == BUF_SZ) {
            fprintf(stderr, "record exceeds buffer capacity\n");
            return 1;
        }
    }
    printf("%lld %lld\n", records, base_pairs);
    free(buf);
    fclose(fp);
    return 0;
}

/*
 * Independent kseq-class FASTQ/FASTA counting baseline.
 *
 * Same-host competitor column for the parser benchmark (role of the
 * reference's kseq runner, /root/reference/benchmark/fastq-parser/main.c —
 * interface: argv[1] = path, prints "records base_pairs"). This is NOT the
 * vendored kseq.h: it is an independent implementation of the same
 * algorithmic class that kseq defines (Heng Li's buffered-getc stream +
 * growable string + multi-line-tolerant 4-phase record loop), written from
 * the format semantics so the repo carries no copied third-party source.
 * Like kseq it is single-threaded, allocation-reusing, byte-at-a-time at
 * line granularity with memchr scanning inside the buffer.
 *
 * Plain files use stdio; ".gz" uses zlib's gzread (kseq's classic config).
 *
 * Build: gcc -O2 -o kseq_class_runner kseq_class_runner.c -lz
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#define BUF_SZ 65536

typedef struct {
    unsigned char buf[BUF_SZ];
    int begin, end; /* window [begin, end) of buffered bytes */
    int is_eof;
    FILE *fp;
    gzFile gz;
} stream_t;

static int str_refill(stream_t *ks) {
    if (ks->is_eof) return 0;
    ks->begin = 0;
    if (ks->gz)
        ks->end = gzread(ks->gz, ks->buf, BUF_SZ);
    else
        ks->end = (int)fread(ks->buf, 1, BUF_SZ, ks->fp);
    if (ks->end <= 0) {
        ks->is_eof = 1;
        ks->end = 0;
        return 0;
    }
    return ks->end;
}

static int str_getc(stream_t *ks) {
    if (ks->begin >= ks->end && !str_refill(ks)) return -1;
    return ks->buf[ks->begin++];
}

typedef struct {
    char *s;
    size_t l, m;
} kstr_t;

static void kstr_push(kstr_t *k, const unsigned char *p, size_t n) {
    if (k->l + n + 1 > k->m) {
        k->m = k->l + n + 1;
        /* round up to next power of two (kseq-style growth) */
        k->m--; k->m |= k->m >> 1; k->m |= k->m >> 2; k->m |= k->m >> 4;
        k->m |= k->m >> 8; k->m |= k->m >> 16; k->m++;
        k->s = (char *)realloc(k->s, k->m);
    }
    memcpy(k->s + k->l, p, n);
    k->l += n;
    k->s[k->l] = 0;
}

/* Append bytes up to (excluding) the next '\n' into dst; consume the
 * newline. Returns 0 on success, -1 when the stream ended first. A trailing
 * '\r' is trimmed (kseq behavior). */
static int str_getline(stream_t *ks, kstr_t *dst) {
    for (;;) {
        if (ks->begin >= ks->end && !str_refill(ks))
            return dst->l ? 0 : -1;
        unsigned char *nl = (unsigned char *)memchr(
            ks->buf + ks->begin, '\n', (size_t)(ks->end - ks->begin));
        if (nl) {
            kstr_push(dst, ks->buf + ks->begin, (size_t)(nl - (ks->buf + ks->begin)));
            ks->begin = (int)(nl - ks->buf) + 1;
            if (dst->l && dst->s[dst->l - 1] == '\r') {
                dst->l--;
                dst->s[dst->l] = 0;
            }
            return 0;
        }
        kstr_push(dst, ks->buf + ks->begin, (size_t)(ks->end - ks->begin));
        ks->begin = ks->end;
    }
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "Usage: kseq_class_runner <path.fastq[.gz]>\n");
        return 1;
    }
    stream_t ks;
    memset(&ks, 0, sizeof(ks));
    size_t n = strlen(argv[1]);
    if (n > 3 && strcmp(argv[1] + n - 3, ".gz") == 0) {
        ks.gz = gzopen(argv[1], "rb");
        if (!ks.gz) { fprintf(stderr, "open failed: %s\n", argv[1]); return 1; }
    } else {
        ks.fp = fopen(argv[1], "rb");
        if (!ks.fp) { fprintf(stderr, "open failed: %s\n", argv[1]); return 1; }
    }

    kstr_t name = {0}, seq = {0}, qual = {0}, line = {0};
    long long records = 0, base_pairs = 0;
    int c = str_getc(&ks); /* first record marker */
    while (c == '@' || c == '>') {
        int is_fq = (c == '@');
        name.l = seq.l = qual.l = 0;
        if (str_getline(&ks, &name) < 0) break; /* header after marker */
        /* sequence lines until '+' (FASTQ), next record marker, or EOF */
        for (;;) {
            c = str_getc(&ks);
            if (c < 0 || c == '+' || c == '@' || c == '>') break;
            if (c == '\n' || c == '\r') continue; /* blank line */
            unsigned char cb = (unsigned char)c;
            kstr_push(&seq, &cb, 1);
            line.l = 0;
            if (str_getline(&ks, &line) < 0) { c = -1; break; }
            kstr_push(&seq, (unsigned char *)line.s, line.l);
        }
        if (is_fq && c == '+') {
            line.l = 0;
            if (str_getline(&ks, &line) < 0) { /* separator line */
                fprintf(stderr, "truncated record\n");
                return 1;
            }
            while (qual.l < seq.l) {
                line.l = 0;
                if (str_getline(&ks, &line) < 0) break;
                kstr_push(&qual, (unsigned char *)line.s, line.l);
            }
            if (qual.l != seq.l) {
                fprintf(stderr, "seq/qual length mismatch\n");
                return 1;
            }
            c = str_getc(&ks); /* next record marker */
        }
        records++;
        base_pairs += (long long)seq.l;
    }
    printf("%lld %lld\n", records, base_pairs);
    free(name.s); free(seq.s); free(qual.s); free(line.s);
    if (ks.gz) gzclose(ks.gz);
    if (ks.fp) fclose(ks.fp);
    return 0;
}

// Compiled counting runner over the native scan engine (role of the
// reference's compiled Mojo runner, benchmark/fastq-parser/run_blazeseq.mojo:
// count reads+bases, print "records base_pairs"). The Python runners measure
// the Python-user experience; this one is the compiled-vs-compiled
// head-to-head against the kseq-class C baseline, with identical output for
// the harness cross-check.
//
// Build: g++ -O3 -march=native -o run_fastq_native \
//            benchmark/runners/run_fastq_native.cpp blazeseq_tpu/native/scan.cpp
// Usage: run_fastq_native <path.fastq> [--validate]

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

extern "C" {
int64_t bs_count_fastq(const uint8_t*, int64_t, int64_t, int32_t, int32_t,
                       uint8_t, uint8_t, int64_t*, int64_t*, int32_t*,
                       int32_t*);
int64_t pz_decode_chunk(const uint8_t*, int64_t, int64_t, int64_t, uint16_t*,
                        int64_t, int64_t*, int32_t*, int32_t*);
void pz_narrow(const uint16_t*, int64_t, uint8_t*);
}

// Inflate a whole (possibly multi-member) gzip buffer with the pinflate
// decode core (single thread; from the true stream start no markers can
// occur, so symbols narrow straight to bytes). Returns malloc'd plain
// bytes + size, or NULL on error. CRC32 of each member is verified.
static uint8_t* gunzip_all(const uint8_t* comp, int64_t n, int64_t* out_n) {
  int64_t cap = n * 4 + (1 << 20);
  uint8_t* plain = (uint8_t*)malloc((size_t)cap);
  int64_t total = 0;
  int64_t pos = 0;  // byte offset
  while (pos + 18 <= n) {
    if (comp[pos] != 0x1f || comp[pos + 1] != 0x8b || comp[pos + 2] != 8) {
      free(plain);
      return NULL;
    }
    const uint8_t flg = comp[pos + 3];
    int64_t p = pos + 10;
    if (flg & 4) {  // FEXTRA
      if (p + 2 > n) { free(plain); return NULL; }
      p += 2 + (comp[p] | (comp[p + 1] << 8));
    }
    if (flg & 8) while (p < n && comp[p++]) {}   // FNAME
    if (flg & 16) while (p < n && comp[p++]) {}  // FCOMMENT
    if (flg & 2) p += 2;                         // FHCRC
    if (p >= n) { free(plain); return NULL; }
    // decode the member's deflate stream
    int64_t syms_cap = cap - total + 4096;
    uint16_t* syms = (uint16_t*)malloc((size_t)syms_cap * 2);
    int64_t end_bit = 0;
    int32_t fin = 0, err = 0;
    int64_t n_out = pz_decode_chunk(comp, n * 8, p * 8, n * 8, syms,
                                    syms_cap, &end_bit, &fin, &err);
    while (err == 4) {  // output capacity: grow and retry
      free(syms);
      syms_cap *= 2;
      cap = total + syms_cap;
      plain = (uint8_t*)realloc(plain, (size_t)cap);
      syms = (uint16_t*)malloc((size_t)syms_cap * 2);
      n_out = pz_decode_chunk(comp, n * 8, p * 8, n * 8, syms, syms_cap,
                              &end_bit, &fin, &err);
    }
    if (err != 0 || !fin) { free(syms); free(plain); return NULL; }
    if (total + n_out > cap) {
      cap = total + n_out + (1 << 20);
      plain = (uint8_t*)realloc(plain, (size_t)cap);
    }
    pz_narrow(syms, n_out, plain + total);
    free(syms);
    // trailer: CRC32 + ISIZE
    const int64_t tpos = (end_bit + 7) / 8;
    if (tpos + 8 > n) { free(plain); return NULL; }
    uint32_t want_crc, want_isz;
    memcpy(&want_crc, comp + tpos, 4);
    memcpy(&want_isz, comp + tpos + 4, 4);
    const uint32_t got_crc =
        (uint32_t)crc32(0, plain + total, (uInt)n_out);
    if (got_crc != want_crc || (uint32_t)n_out != want_isz) {
      free(plain);
      return NULL;
    }
    total += n_out;
    pos = tpos + 8;
  }
  *out_n = total;
  return plain;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "Usage: run_fastq_native <path.fastq> [--validate]\n");
    return 1;
  }
  int validate = 0;
  for (int i = 2; i < argc; ++i)
    if (!strcmp(argv[i], "--validate")) validate = 1;

  const int fd = open(argv[1], O_RDONLY);
  if (fd < 0) { perror("open"); return 1; }
  struct stat st;
  if (fstat(fd, &st) != 0) { perror("fstat"); return 1; }
  int64_t n = (int64_t)st.st_size;
  uint8_t* buf =
      (uint8_t*)mmap(nullptr, (size_t)n, PROT_READ, MAP_PRIVATE, fd, 0);
  if (buf == MAP_FAILED) { perror("mmap"); return 1; }
  madvise(buf, (size_t)n, MADV_SEQUENTIAL);

  // .gz input: inflate with the pinflate core (CRC-verified), then count
  int64_t nlen = (int64_t)strlen(argv[1]);
  uint8_t* plain = NULL;
  if (nlen > 3 && strcmp(argv[1] + nlen - 3, ".gz") == 0) {
    int64_t pn = 0;
    plain = gunzip_all(buf, n, &pn);
    if (!plain) {
      fprintf(stderr, "gzip decode failed\n");
      return 1;
    }
    munmap(buf, (size_t)n);
    buf = plain;
    n = pn;
  }

  // sanger schema bounds (matches the harness corpus)
  const uint8_t q_lower = 33, q_span = 126 - 33;
  int64_t bases = 0, consumed = 0;
  int32_t err = 0, phase = 0;
  int64_t records = bs_count_fastq(buf, n, 0, validate, validate, q_lower,
                                   q_span, &bases, &consumed, &err, &phase);
  if (err != 0) {
    fprintf(stderr, "parse error code %d at byte %lld\n", err,
            (long long)consumed);
    return 1;
  }
  if (consumed < n && phase == 3) {
    // trailing record with no final newline: complete it in a bounce buffer
    // (parser _handle_eof_tail semantics)
    const int64_t rem = n - consumed;
    uint8_t* tailbuf = (uint8_t*)malloc((size_t)rem + 1);
    memcpy(tailbuf, buf + consumed, (size_t)rem);
    tailbuf[rem] = '\n';
    int64_t tb = 0, tc = 0;
    int32_t te = 0, tp = 0;
    records += bs_count_fastq(tailbuf, rem + 1, 0, validate, validate,
                              q_lower, q_span, &tb, &tc, &te, &tp);
    bases += tb;
    free(tailbuf);
    if (te != 0) { fprintf(stderr, "tail parse error %d\n", te); return 1; }
  }
  printf("%lld %lld\n", (long long)records, (long long)bases);
  if (plain)
    free(plain);
  else
    munmap(buf, (size_t)n);
  close(fd);
  return 0;
}

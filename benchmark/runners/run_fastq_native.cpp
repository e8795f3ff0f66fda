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

extern "C" int64_t bs_count_fastq(const uint8_t*, int64_t, int64_t, int32_t,
                                  int32_t, uint8_t, uint8_t, int64_t*,
                                  int64_t*, int32_t*, int32_t*);

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
  const int64_t n = (int64_t)st.st_size;
  uint8_t* buf =
      (uint8_t*)mmap(nullptr, (size_t)n, PROT_READ, MAP_PRIVATE, fd, 0);
  if (buf == MAP_FAILED) { perror("mmap"); return 1; }
  madvise(buf, (size_t)n, MADV_SEQUENTIAL);

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
  munmap(buf, (size_t)n);
  close(fd);
  return 0;
}

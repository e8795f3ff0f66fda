// Compiled FASTA counting runner over the native scan engine (role of the
// reference's compiled Mojo runner, benchmark/fasta-parser/
// run_blazeseq_fasta.mojo): count records + bases, print
// "records base_pairs".
//
// Build: g++ -O3 -march=native -o run_fasta_native \
//            benchmark/runners/run_fasta_native.cpp blazeseq_tpu/native/scan.cpp
// Exit code 2 = the fast accounting declined this file (pathological
// whitespace layout); the harness falls back to the Python runner.

#include <cstdint>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" int64_t bs_count_fasta(const uint8_t*, int64_t, int64_t, int32_t,
                                  int64_t*, int64_t*, int64_t*, int32_t*);

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "Usage: run_fasta_native <path.fasta>\n");
    return 1;
  }
  const int fd = open(argv[1], O_RDONLY);
  if (fd < 0) { perror("open"); return 1; }
  struct stat st;
  if (fstat(fd, &st) != 0) { perror("fstat"); return 1; }
  const int64_t n = (int64_t)st.st_size;
  uint8_t* buf =
      (uint8_t*)mmap(nullptr, (size_t)n, PROT_READ, MAP_PRIVATE, fd, 0);
  if (buf == MAP_FAILED) { perror("mmap"); return 1; }
  madvise(buf, (size_t)n, MADV_SEQUENTIAL);
  int64_t bases = 0, consumed = 0, lines = 0;
  int32_t fallback = 0;
  const int64_t records =
      bs_count_fasta(buf, n, 0, 1, &bases, &consumed, &lines, &fallback);
  if (fallback) {
    fprintf(stderr, "fast accounting declined; use the exact runner\n");
    return 2;
  }
  printf("%lld %lld\n", (long long)records, (long long)bases);
  munmap(buf, (size_t)n);
  close(fd);
  return 0;
}

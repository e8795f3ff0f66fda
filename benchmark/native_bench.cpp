// Standalone microbenchmark for the native scan kernels (no Python).
// Build+run (see benchmark/README.md):
//   g++ -O3 -march=native -o /tmp/native_bench benchmark/native_bench.cpp \
//       blazeseq_tpu/native/scan.cpp && /tmp/native_bench [size_mb] [reps]
// Times bs_count_fastq and bs_scan_gather_padded over a synthetic corpus
// (same generator as the Python harness), best-of-reps.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <vector>

extern "C" {
int64_t bs_generate_fastq(int64_t, int64_t, int64_t, int64_t, int64_t, int64_t,
                          int64_t, int32_t, int32_t, int32_t, const uint8_t*,
                          uint8_t*);
int64_t bs_count_fastq(const uint8_t*, int64_t, int64_t, int32_t, int32_t,
                       uint8_t, uint8_t, int64_t*, int64_t*, int32_t*,
                       int32_t*);
int64_t bs_scan_gather_padded(const uint8_t*, int64_t, int64_t, int64_t,
                              int64_t, int32_t, int32_t, uint8_t, uint8_t,
                              int64_t, uint8_t*, uint8_t*, int32_t*, int64_t*,
                              int32_t*, int32_t*);
int64_t bs_scan_fastq(const uint8_t*, int64_t, int64_t, int64_t, int32_t,
                      int32_t, uint8_t, uint8_t, int64_t*, int64_t*, int32_t*,
                      int32_t*);
}

static double now() {
  using namespace std::chrono;
  return duration<double>(steady_clock::now().time_since_epoch()).count();
}

int main(int argc, char** argv) {
  const int64_t size_mb = argc > 1 ? atoll(argv[1]) : 512;
  const int reps = argc > 2 ? atoi(argv[2]) : 7;
  const int64_t read_len = argc > 3 ? atoll(argv[3]) : 100;

  // sanger schema: lower 33, upper 126, offset 33
  const uint8_t q_lower = 33, q_span = 126 - 33;
  const int64_t rec_size = 7 + 8 + read_len + 1 + 2 + read_len + 1;
  const int64_t n_reads = size_mb * 1024 * 1024 / rec_size;
  const uint8_t lut[8] = {'A', 'C', 'G', 'T', 'A', 'C', 'G', 'G'};
  std::vector<uint8_t> buf((size_t)(n_reads * (rec_size + 16)));
  const int64_t n =
      bs_generate_fastq(0, n_reads, n_reads, read_len, read_len, 2, 40, 33, 33,
                        126, lut, buf.data());
  printf("# corpus: %lld reads, %.1f MB\n", (long long)n_reads, n / 1e6);

  const int64_t width = ((read_len + 127) / 128) * 128;
  const int64_t batch = 65536;
  uint8_t* seq = (uint8_t*)aligned_alloc(64, (size_t)(batch * width));
  uint8_t* qual = (uint8_t*)aligned_alloc(64, (size_t)(batch * width));
  std::vector<int32_t> lens((size_t)batch);
  std::vector<int64_t> offs((size_t)batch * 5);

  int64_t bases = 0, consumed = 0;
  int32_t ec = 0, ep = 0;

  double best_count = 1e30;
  for (int r = 0; r < reps; ++r) {
    double t0 = now();
    int64_t recs = bs_count_fastq(buf.data(), n, 0, 1, 1, q_lower, q_span,
                                  &bases, &consumed, &ec, &ep);
    double dt = now() - t0;
    if (dt < best_count) best_count = dt;
    if (r == 0)
      printf("# count: %lld records %lld bases err=%d\n", (long long)recs,
             (long long)bases, ec);
  }
  printf("count:        %.2f GB/s\n", n / best_count / 1e9);

  double best_scan = 1e30;
  for (int r = 0; r < reps; ++r) {
    double t0 = now();
    int64_t pos = 0;
    int64_t total = 0;
    while (pos < n) {
      int64_t got = bs_scan_fastq(buf.data(), n, pos, batch, 1, 1, q_lower,
                                  q_span, offs.data(), &consumed, &ec, &ep);
      total += got;
      if (consumed <= pos) break;
      pos = consumed;
    }
    double dt = now() - t0;
    if (dt < best_scan) best_scan = dt;
    if (r == 0) printf("# scan offsets: %lld records\n", (long long)total);
  }
  printf("scan_offsets: %.2f GB/s\n", n / best_scan / 1e9);

  double best_pad = 1e30;
  for (int r = 0; r < reps; ++r) {
    double t0 = now();
    int64_t pos = 0;
    int64_t total = 0;
    while (pos < n) {
      int64_t got = bs_scan_gather_padded(
          buf.data(), n, pos, batch, width, 1, 1, q_lower, q_span, 4 * width,
          seq, qual, lens.data(), &consumed, &ec, &ep);
      total += got;
      if (consumed <= pos) break;
      pos = consumed;
    }
    double dt = now() - t0;
    if (dt < best_pad) best_pad = dt;
    if (r == 0) printf("# padded: %lld records err=%d\n", (long long)total, ec);
  }
  printf("padded_feed:  %.2f GB/s\n", n / best_pad / 1e9);

  free(seq);
  free(qual);
  return 0;
}

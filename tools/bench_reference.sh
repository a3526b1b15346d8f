#!/bin/bash
# Measure the reference C++ FM chain (SURVEY.md 3.2) on this host.
# Builds out-of-tree against the read-only reference at /root/reference.
set -e
D=$(mktemp -d)
cat > "$D/config.hh" <<'EOF'
#define SDR_VERSION_MAJOR 0
#define SDR_VERSION_MINOR 1
#define SDR_VERSION_PATCH 0
#define SDR_VERSION_STRING "0.1.0"
EOF
cat > "$D/bench_ref.cc" <<'EOF'
// Benchmark of the reference FM chain: IQBaseBand<int16> -> FMDemod<int16>
// -> FMDeemph<int16> with direct edges (reference: examples/sdr_fm.cc:38-64).
#include "baseband.hh"
#include "demod.hh"
#include <ctime>
#include <cstdio>
#include <cmath>
using namespace sdr;
class CountSink : public Sink<int16_t> {
public:
  size_t total;
  CountSink() : Sink<int16_t>(), total(0) {}
  virtual void config(const Config &) {}
  virtual void process(const Buffer<int16_t> &b, bool) { total += b.size(); }
};
int main() {
  const double Fs = 960000.0;
  const size_t B = 96000;
  IQBaseBand<int16_t> bb(120000.0, 200000.0, 64, 4);
  FMDemod<int16_t> fm;
  FMDeemph<int16_t> de;
  CountSink cnt;
  bb.connect(&fm, true); fm.connect(&de, true); de.connect(&cnt, true);
  bb.config(Config(Config::typeId< std::complex<int16_t> >(), Fs, B, 1));
  Buffer< std::complex<int16_t> > buf(B);
  for (size_t i = 0; i < B; i++) {
    double ph = 2*M_PI*120000.0*i/Fs + 3.0*std::sin(2*M_PI*1000.0*i/Fs);
    buf[i] = std::complex<int16_t>((int16_t)(10000*std::cos(ph)),
                                   (int16_t)(10000*std::sin(ph)));
  }
  for (int it = 0; it < 3; it++) bb.process(buf, false);
  // Best-of-3 runs of 100 iterations — the SAME protocol as bench.py's
  // best-of-3, so vs_baseline compares like with like.
  const int iters = 100, runs = 3;
  double best = 1e30;
  for (int r = 0; r < runs; r++) {
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    for (int it = 0; it < iters; it++) bb.process(buf, false);
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + 1e-9*(t1.tv_nsec - t0.tv_nsec);
    if (dt < best) best = dt;
  }
  printf("{\"chain\": \"IQBaseBand(64,4)+FMDemod+FMDeemph\", "
         "\"msps\": %.3f, \"protocol\": \"best-of-3 x 100 iters\"}\n",
         (double)iters * B / best / 1e6);
  return 0;
}
EOF
g++ -O3 -march=native -std=c++03 -I"$D" -I/root/reference/src \
  "$D/bench_ref.cc" \
  /root/reference/src/buffer.cc /root/reference/src/node.cc \
  /root/reference/src/queue.cc /root/reference/src/logger.cc \
  /root/reference/src/exception.cc /root/reference/src/traits.cc \
  -o "$D/bench_ref" -lpthread
"$D/bench_ref"
rm -rf "$D"

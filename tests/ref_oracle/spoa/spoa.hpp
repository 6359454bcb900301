// Interop stub for the oracle build: spoa is an external clone the
// reference Makefile fetches from GitHub (unavailable here).  Provides the
// minimal surface HaplotypeGenerator::poa uses (HaplotypeGenerator.cpp:
// 167-199: Create(kNW, 1, -1, -1), per-seq Align+AddAlignment, one
// GenerateConsensus).
//
// GenerateConsensus delegates to the PRODUCTION consensus routine
// (ltr_poa_consensus in liblongtr_native.so, located via the
// LONGTR_NATIVE_SO env var tests/ref_oracle/__init__.py exports): the
// oracle's POA is then by construction the same binary code the pipeline
// runs, so record-level parity tests can replay rescue-path loci — the
// claim checked becomes "given the same cluster consensus, the compiled
// reference chain reproduces our records byte for byte".  Whether that
// consensus equals real spoa remains environmentally unprovable (spoa is
// absent) and is mitigated by the POA property suite.
//
// Clusters of exactly 30 sequences still throw: the reference subsamples
// clusters of >= 30 via std::random_device (HaplotypeGenerator.cpp:
// 181-192), so the 30 sequences it feeds here are an unknowable random
// subset/order — irreproducible by design.  (<= 29 sequences pass through
// unsampled in input order.)
#ifndef ORACLE_SPOA_STUB_HPP_
#define ORACLE_SPOA_STUB_HPP_

#include <dlfcn.h>

#include <cstdint>
#include <cstdlib>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace spoa {

enum class AlignmentType { kSW = 0, kNW = 1, kOV = 2 };

using Alignment = std::vector<std::pair<std::int32_t, std::int32_t>>;

class Graph;

class AlignmentEngine {
 public:
  static std::unique_ptr<AlignmentEngine> Create(AlignmentType t,
                                                 std::int8_t m, std::int8_t n,
                                                 std::int8_t g) {
    if (t != AlignmentType::kNW || m != 1 || n != -1 || g != -1)
      throw std::runtime_error(
          "spoa stub: unexpected score model (expected kNW, 1, -1, -1)");
    return std::unique_ptr<AlignmentEngine>(new AlignmentEngine());
  }
  Alignment Align(const std::string&, const Graph&) { return Alignment(); }
};

typedef long (*ltr_poa_fn)(const char*, const long*, long, char*, long);

inline ltr_poa_fn load_ltr_poa() {
  static ltr_poa_fn fn = nullptr;
  if (fn) return fn;
  const char* so = std::getenv("LONGTR_NATIVE_SO");
  if (!so)
    throw std::runtime_error(
        "spoa stub: LONGTR_NATIVE_SO not set (ref_oracle exports it)");
  void* h = dlopen(so, RTLD_NOW | RTLD_GLOBAL);
  if (!h) throw std::runtime_error(std::string("spoa stub: dlopen failed: ")
                                   + dlerror());
  fn = (ltr_poa_fn)dlsym(h, "ltr_poa_consensus");
  if (!fn)
    throw std::runtime_error("spoa stub: ltr_poa_consensus not found");
  return fn;
}

class Graph {
 public:
  void AddAlignment(const Alignment&, const std::string& seq) {
    seqs_.push_back(seq);
  }
  std::string GenerateConsensus() {
    if (seqs_.size() >= 30)
      throw std::runtime_error(
          "spoa stub: >=30-seq cluster was subsampled nondeterministically "
          "upstream (std::random_device, HaplotypeGenerator.cpp:183)");
    ltr_poa_fn fn = load_ltr_poa();
    std::string cat;
    std::vector<long> lens;
    long cap = 64;
    for (const auto& s : seqs_) {
      cat += s;
      lens.push_back((long)s.size());
      cap += (long)s.size();
    }
    std::vector<char> out(cap);
    long n = fn(cat.c_str(), lens.data(), (long)lens.size(), out.data(),
                cap);
    if (n < 0)
      throw std::runtime_error("spoa stub: ltr_poa_consensus failed");
    return std::string(out.data(), (size_t)n);
  }

 private:
  std::vector<std::string> seqs_;
};

}  // namespace spoa

#endif

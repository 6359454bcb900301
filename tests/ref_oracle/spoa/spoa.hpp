// Interop stub for the oracle build: spoa is an external clone the
// reference Makefile fetches from GitHub (unavailable here).  Provides the
// minimal surface HaplotypeGenerator::poa uses; any call throws, so parity
// tests must exercise only non-POA paths (the rescue-clustering path is
// nondeterministic upstream anyway: std::random_device at
// HaplotypeGenerator.cpp:183).
#ifndef ORACLE_SPOA_STUB_HPP_
#define ORACLE_SPOA_STUB_HPP_

#include <cstdint>
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
  static std::unique_ptr<AlignmentEngine> Create(AlignmentType, std::int8_t,
                                                 std::int8_t, std::int8_t) {
    return std::unique_ptr<AlignmentEngine>(new AlignmentEngine());
  }
  Alignment Align(const std::string&, const Graph&) {
    throw std::runtime_error("spoa stub: POA path exercised in oracle");
  }
};

class Graph {
 public:
  void AddAlignment(const Alignment&, const std::string&) {
    throw std::runtime_error("spoa stub: POA path exercised in oracle");
  }
  std::string GenerateConsensus() {
    throw std::runtime_error("spoa stub: POA path exercised in oracle");
  }
};

}  // namespace spoa

#endif

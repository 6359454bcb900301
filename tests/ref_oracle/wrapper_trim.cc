// Trim-oracle wrapper: compiles the reference's bam_io.cpp IN PLACE against
// the stub htslib headers (stub_htslib/) so BamAlignment::TrimAlignment —
// the read-trimming CIGAR surgery that feeds left_align_reads — runs as
// compiled reference code (bam_io.cpp:267-372).
//
// Built as a SEPARATE shared library with hidden visibility: the main
// oracle (libref_oracle.so) defines a stub BamAlignment with the same
// mangled names, so the two .so files must not share symbols.  Only the
// rt_* C ABI is exported.

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

#include "error.h"

void printErrorAndDie(std::string message) {
  throw std::runtime_error("ref_trim printErrorAndDie: " + message);
}

// Pre-include the std headers bam_io.h pulls so the access-promotion macro
// below cannot leak into libstdc++ internals.
#include <algorithm>
#include <iostream>
#include <map>
#include <sstream>
#include <vector>
#include <sys/stat.h>

// Test-only access promotion (bases_/qualities_/cigar_ops_ are private);
// GCC does not reorder members by access specifier.
#define private public
#include "bam_io.h"
#undef private

extern "C" {

__attribute__((visibility("default")))
int rt_trim_alignment(const char* seq, const char* quals,
                      const char* cigar_text, int32_t pos, int32_t end_pos,
                      int32_t min_read_start, int32_t max_read_stop,
                      int32_t* out_pos, int32_t* out_end, int32_t* out_len,
                      int32_t* out_deleted, char* out, long cap) {
  try {
    BamAlignment a;
    a.built_ = true;
    a.pos_ = pos;
    a.end_pos_ = end_pos;
    a.bases_ = seq;
    a.qualities_ = quals;
    a.length_ = (int32_t)a.bases_.size();
    std::string cig(cigar_text);
    size_t k = 0;
    while (k < cig.size()) {
      size_t k2 = k;
      while (k2 < cig.size() && isdigit(cig[k2])) k2++;
      a.cigar_ops_.push_back(
          CigarOp(cig[k2], atoi(cig.substr(k, k2 - k).c_str())));
      k = k2 + 1;
    }

    a.TrimAlignment(min_read_start, max_read_stop);

    *out_pos = a.pos_;
    *out_end = a.end_pos_;
    *out_len = a.length_;
    *out_deleted = a.deleted_ ? 1 : 0;
    std::string enc = a.bases_;
    enc.push_back('\0');
    enc += a.qualities_;
    enc.push_back('\0');
    for (size_t i = 0; i < a.cigar_ops_.size(); i++)
      enc += std::to_string(a.cigar_ops_[i].Length) + a.cigar_ops_[i].Type;
    enc.push_back('\0');
    if ((long)enc.size() > cap) return -4;
    memcpy(out, enc.data(), enc.size());
    return 0;
  } catch (const std::exception& e) {
    std::string msg = std::string("EXC:") + e.what();
    if ((long)msg.size() + 1 <= cap) memcpy(out, msg.c_str(), msg.size() + 1);
    return -1;
  }
}

}  // extern "C"

// Interop shim for the reference-source oracle build (tests only).
//
// The reference's NeedlemanWunsch.h (and, round 3, snp_phasing_quality.h /
// extract_indels.h / seq_stutter_genotyper.h) include "bam_io.h", which drags
// in htslib (absent in this environment).  Force-including this header first
// (-include) predefines bam_io.h's include guard so the real header's body is
// skipped, and provides the minimal types the compiled reference sources
// actually use from it:
//   - CigarOp                      (/root/reference/src/bam_io.h:30-39)
//   - BamAlignment accessor subset (/root/reference/src/bam_io.h:100-145)
//     used by snp_phasing_quality.cpp (Position/GetEndPosition/QueryBases/
//     Qualities/CigarData).  The oracle driver fills the fields directly.
#ifndef BAM_IO_H_
#define BAM_IO_H_

#include <cstdint>
#include <string>
#include <vector>

class CigarOp {
 public:
  char Type;
  int32_t Length;

  CigarOp(char type, int32_t length) {
    Type = type;
    Length = length;
  }
};

class BamAlignment {
 public:
  int32_t pos_;
  int32_t end_pos_;
  std::string bases_;
  std::string qualities_;
  std::vector<CigarOp> cigar_ops_;

  BamAlignment() : pos_(0), end_pos_(0) {}

  int32_t Position() const { return pos_; }
  int32_t GetEndPosition() const { return end_pos_; }
  const std::string& QueryBases() { return bases_; }
  const std::string& Qualities() { return qualities_; }
  const std::vector<CigarOp>& CigarData() { return cigar_ops_; }
};

#endif

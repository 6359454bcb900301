// Interop shim for the reference-source oracle build (tests only).
//
// The reference's NeedlemanWunsch.h includes "../bam_io.h", which drags in
// htslib (absent in this environment).  Force-including this header first
// (-include) predefines bam_io.h's include guard so the real header's body
// is skipped, and provides the single type NeedlemanWunsch actually uses
// from it (CigarOp; see /root/reference/src/bam_io.h:30-39).
#ifndef BAM_IO_H_
#define BAM_IO_H_

#include <cstdint>

class CigarOp {
 public:
  char Type;
  int32_t Length;

  CigarOp(char type, int32_t length) {
    Type = type;
    Length = length;
  }
};

#endif

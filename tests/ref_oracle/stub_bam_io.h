// Interop shim for the reference-source oracle build (tests only).
//
// The reference's bam_io.{h,cpp} wrap htslib (absent in this environment).
// Force-including this header first (-include) predefines bam_io.h's include
// guard so the real header's body is skipped, and provides data-class stubs
// for the types the compiled reference sources actually use:
//   - CigarOp                       (/root/reference/src/bam_io.h:30-39)
//   - BamAlignment accessor surface (/root/reference/src/bam_io.h:60-260)
//     used by snp_phasing_quality.cpp and bam_processor.cpp (round 3: the
//     full read_and_filter_reads chain) — positions, flags, tags, hard-clip
//     probes.  The oracle driver fills the fields directly; tag values live
//     in plain maps.
//   - BamWriter / BamHeader / BamCramMultiReader: capture-only / queue-fed
//     stand-ins so bam_processor.cpp compiles and the driver can feed
//     synthetic alignments through the REAL filter chain.
//   - BuildCigarString (bam_io free function used by extract_mappings).
//
// These stubs carry data only; every decision asserted in parity tests is
// made by compiled reference code.
#ifndef BAM_IO_H_
#define BAM_IO_H_

#include <cstdint>
#include <map>
#include <sstream>
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
  std::string name_;
  std::string filename_;
  std::string ref_;
  int32_t mapq_;
  int32_t mate_pos_;
  bool is_paired_;
  bool is_mapped_;
  bool is_first_mate_;
  bool is_reverse_;
  std::map<std::string, std::string> str_tags_;
  std::map<std::string, int64_t> int_tags_;

  BamAlignment()
      : pos_(0), end_pos_(0), ref_("ref"), mapq_(60), mate_pos_(0),
        is_paired_(false), is_mapped_(true), is_first_mate_(true),
        is_reverse_(false) {}

  int32_t Position() const { return pos_; }
  int32_t GetEndPosition() const { return end_pos_; }
  int32_t Length() const { return (int32_t)bases_.size(); }
  int32_t MatePosition() const { return mate_pos_; }
  int32_t MapQuality() const { return mapq_; }
  bool IsPaired() const { return is_paired_; }
  bool IsMapped() const { return is_mapped_; }
  bool IsFirstMate() const { return is_first_mate_; }
  bool IsReverseStrand() const { return is_reverse_; }
  const std::string& Name() const { return name_; }
  const std::string& Filename() const { return filename_; }
  const std::string& Ref() const { return ref_; }
  const std::string& QueryBases() const { return bases_; }
  const std::string& Qualities() const { return qualities_; }
  const std::vector<CigarOp>& CigarData() const { return cigar_ops_; }

  bool StartsWithHardClip() const {
    return !cigar_ops_.empty() && cigar_ops_.front().Type == 'H';
  }
  bool EndsWithHardClip() const {
    return !cigar_ops_.empty() && cigar_ops_.back().Type == 'H';
  }

  bool HasTag(const char* tag) const {
    return str_tags_.count(tag) > 0 || int_tags_.count(tag) > 0;
  }
  bool RemoveTag(const char* tag) {
    return str_tags_.erase(tag) > 0 || int_tags_.erase(tag) > 0;
  }
  bool AddStringTag(const char* tag, const std::string& value) {
    str_tags_[tag] = value;
    return true;
  }
  bool GetStringTag(const char* tag, std::string& value) const {
    auto it = str_tags_.find(tag);
    if (it == str_tags_.end()) return false;
    value = it->second;
    return true;
  }
  bool GetIntTag(const char* tag, int64_t& value) const {
    auto it = int_tags_.find(tag);
    if (it == int_tags_.end()) return false;
    value = it->second;
    return true;
  }
};

inline std::string BuildCigarString(const std::vector<CigarOp>& cigar) {
  std::stringstream ss;
  for (auto it = cigar.begin(); it != cigar.end(); ++it)
    ss << it->Length << it->Type;
  return ss.str();
}

class BamWriter {
 public:
  std::vector<BamAlignment> saved_;
  bool SaveAlignment(BamAlignment& aln) {
    saved_.push_back(aln);
    return true;
  }
};

class BamHeader {
 public:
  int32_t ref_id(const std::string&) const { return 0; }
};

// Queue-fed stand-in: the oracle driver preloads `queue_` and the compiled
// read_and_filter_reads consumes it through the real GetNextAlignment API.
class BamCramMultiReader {
 public:
  enum { ORDER_ALNS_BY_SAMPLE = 0, ORDER_ALNS_BY_FILE = 1 };
  std::vector<BamAlignment> queue_;
  size_t next_ = 0;
  BamHeader header_;

  int get_merge_type() const { return ORDER_ALNS_BY_FILE; }
  const BamHeader* bam_header() const { return &header_; }
  bool SetRegion(const std::string&, int32_t, int32_t) {
    next_ = 0;
    return true;
  }
  bool GetNextAlignment(BamAlignment& out) {
    if (next_ >= queue_.size()) return false;
    out = queue_[next_++];
    return true;
  }
};

#endif

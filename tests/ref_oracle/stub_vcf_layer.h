// Interop shim #2 for the reference-source oracle build (tests only).
//
// Round 3 compiles the reference's full genotyping + VCF-emission chain
// (seq_stutter_genotyper.cpp, em_stutter_genotyper.cpp) into the oracle, and
// the DenovoFinder chain (denovos/*.cpp, haplotype_tracker.cpp, the
// UnphasedGL/PhasedGL builders in vcf_input.cpp).  Those translation units
// include headers that are htslib-backed and cannot compile here:
// vcf_reader.h, vcf_writer.h, bgzf_streams.h, bam_processor.h.
// Force-including this header predefines their include guards so their
// bodies are skipped, and supplies functional replacements:
//
//  - VCF::Variant / VCF::VCFReader: a REPLAYABLE mini VCF layer.  The real
//    classes wrap htslib bcf parsing + tabix iteration
//    (/root/reference/src/vcf_reader.{h,cpp}); this stub parses PLAIN-TEXT
//    VCF files and mirrors the exact htslib-level semantics the compiled
//    reference code observes: 1-based get_position() (= bcf pos+1),
//    genotype extraction per vcf_reader.cpp:31-73 (either-allele '.' =>
//    missing, phased flag from the second separator, the all-samples-missing
//    single-entry path), INFO int cardinality checks (single => exactly 1,
//    multiple => >1, vcf_reader.h:111-131), FORMAT float extraction with
//    entries_per_sample = total/num_samples (vcf_reader.h:133-148, GLs are
//    C floats), tabix-preset record intervals ([POS, POS+len(REF)-1], with
//    an INFO END= override like tbx.c's VCF preset), set_region returning
//    false only for unknown chromosomes, and get_next_variant's
//    jumped_/chromosome-advance behavior (vcf_reader.cpp:114-141).
//    Haploid GT entries are rejected loudly: htslib would hand the
//    reference garbage (bcf vector_end reinterpreted as an allele), so no
//    parity flow may depend on them.
//  - VCFWriter: the real one heap-buffers record text and bgzf-compresses it
//    (/root/reference/src/vcf_writer.h:25-88).  write_vcf_record's only
//    interaction is add_vcf_record(chrom, pos, text)
//    (/root/reference/src/seq_stutter_genotyper.cpp:1396) — the stub captures
//    the uncompressed record text so parity tests can diff it byte-for-byte.
//  - bgzfostream (bgzf_streams.h): the DenovoFinder scanners stream their
//    output VCF through it; the stub is a plain std::ofstream so the oracle
//    writes uncompressed text that tests diff against our bgzf-decompressed
//    output.
//  - bam_processor.h compiles for real since round 3 (the stub BamAlignment/
//    BamWriter/BamCramMultiReader in stub_bam_io.h carry its data needs), so
//    the compiled read_and_filter_reads chain is drivable from tests.
#ifndef REF_ORACLE_STUB_VCF_LAYER_H_
#define REF_ORACLE_STUB_VCF_LAYER_H_

#define VCF_READER_H_
#define VCF_WRITER_H_
#define __BGZF_STREAMS_H__

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <limits>
#include <map>
#include <set>
#include <sstream>
#include <string>
#include <vector>

void printErrorAndDie(std::string message);

namespace VCF {

class VCFReader;

namespace stub_detail {
inline std::vector<std::string> split(const std::string& s, char delim) {
  std::vector<std::string> out;
  std::string cur;
  for (char c : s) {
    if (c == delim) {
      out.push_back(cur);
      cur.clear();
    } else {
      cur += c;
    }
  }
  out.push_back(cur);
  return out;
}
}  // namespace stub_detail

class Variant {
 private:
  friend class VCFReader;

  const VCFReader* vcf_reader_;
  bool has_record_;
  std::string chrom_, id_;
  int32_t pos0_;
  std::vector<std::string> alleles_;
  // INFO: key -> raw value string ("" for flags)
  std::map<std::string, std::string> info_;
  // FORMAT: key -> per-sample raw value string
  std::map<std::string, std::vector<std::string> > format_;
  int num_samples_, num_missing_;
  std::vector<bool> missing_, phased_;
  std::vector<int> gt_1_, gt_2_;

  // Mirrors Variant::extract_genotypes (vcf_reader.cpp:31-73).
  void extract_genotypes() {
    auto gt_iter = format_.find("GT");
    if (gt_iter == format_.end())
      printErrorAndDie("Failed to extract the genotypes from the VCF record");
    const std::vector<std::string>& gts = gt_iter->second;

    // htslib returns num_samples entries (not 2*num_samples) when every
    // sample genotype is the single missing token '.'.
    bool all_single_missing = true;
    for (const std::string& g : gts)
      if (g != ".") all_single_missing = false;
    if (all_single_missing) {
      missing_ = std::vector<bool>(num_samples_, true);
      phased_ = std::vector<bool>(num_samples_, false);
      gt_1_ = std::vector<int>(num_samples_, -1);
      gt_2_ = std::vector<int>(num_samples_, -1);
      return;
    }

    for (const std::string& g : gts) {
      if (g == ".") {  // htslib pads: first entry missing => call missing
        missing_.push_back(true);
        phased_.push_back(false);
        gt_1_.push_back(-1);
        gt_2_.push_back(-1);
        continue;
      }
      size_t sep = g.find_first_of("/|");
      if (sep == std::string::npos)
        printErrorAndDie("oracle VCF stub: haploid GT entries are not "
                         "supported (htslib would hand the reference "
                         "garbage alleles): " + g);
      std::string a = g.substr(0, sep), b = g.substr(sep + 1);
      if (a == "." || b == ".") {
        missing_.push_back(true);
        phased_.push_back(false);
        gt_1_.push_back(-1);
        gt_2_.push_back(-1);
      } else {
        missing_.push_back(false);
        phased_.push_back(g[sep] == '|');
        gt_1_.push_back(atoi(a.c_str()));
        gt_2_.push_back(atoi(b.c_str()));
      }
    }
  }

  // Parses one data line.  samples/format columns may be absent (sites-only
  // VCF never occurs in the drives we replay).
  void parse(const std::string& line, const VCFReader* reader,
             int num_samples) {
    vcf_reader_ = reader;
    has_record_ = true;
    num_samples_ = num_samples;
    num_missing_ = 0;
    alleles_.clear();
    info_.clear();
    format_.clear();
    missing_.clear();
    phased_.clear();
    gt_1_.clear();
    gt_2_.clear();

    std::vector<std::string> cols = stub_detail::split(line, '\t');
    if ((int)cols.size() < 8 + (num_samples ? 1 + num_samples : 0))
      printErrorAndDie("Failed to parse VCF record");
    chrom_ = cols[0];
    pos0_ = atol(cols[1].c_str()) - 1;
    id_ = cols[2];
    alleles_.push_back(cols[3]);
    if (cols[4] != ".")
      for (const std::string& a : stub_detail::split(cols[4], ','))
        alleles_.push_back(a);
    if (cols[7] != ".") {
      for (const std::string& kv : stub_detail::split(cols[7], ';')) {
        size_t eq = kv.find('=');
        if (eq == std::string::npos)
          info_[kv] = "";
        else
          info_[kv.substr(0, eq)] = kv.substr(eq + 1);
      }
    }
    if (num_samples > 0) {
      std::vector<std::string> keys = stub_detail::split(cols[8], ':');
      for (size_t k = 0; k < keys.size(); k++) {
        std::vector<std::string>& vals = format_[keys[k]];
        for (int s = 0; s < num_samples; s++) {
          std::vector<std::string> fields =
              stub_detail::split(cols[9 + s], ':');
          // trailing fields may be dropped per VCF spec => missing
          vals.push_back(k < fields.size() ? fields[k] : ".");
        }
      }
      extract_genotypes();
      for (int i = 0; i < num_samples_; ++i)
        if (missing_[i]) ++num_missing_;
    }
  }

 public:
  Variant() {
    vcf_reader_ = NULL;
    has_record_ = false;
    pos0_ = -1;
    num_samples_ = 0;
    num_missing_ = 0;
  }

  const std::vector<std::string>& get_alleles() const { return alleles_; }
  const std::string& get_allele(int allele) const { return alleles_[allele]; }
  const std::vector<std::string>& get_samples() const;
  int num_alleles() const { return (int)alleles_.size(); }
  int num_samples() const { return num_samples_; }
  int num_missing() const { return num_missing_; }

  bool is_biallelic_snp() const {
    if (!has_record_) return false;
    return alleles_.size() == 2 && alleles_[0].size() == 1 &&
           alleles_[1].size() == 1;
  }

  std::string get_chromosome() const { return has_record_ ? chrom_ : ""; }

  int32_t get_position() const { return has_record_ ? pos0_ + 1 : -1; }

  std::string get_id() const { return has_record_ ? id_ : ""; }

  bool has_format_field(const std::string& fieldname) const {
    return format_.find(fieldname) != format_.end();
  }

  bool has_info_field(const std::string& fieldname) const {
    return info_.find(fieldname) != info_.end();
  }

  bool sample_call_phased(int sample_index) const {
    return phased_[sample_index];
  }

  bool sample_call_missing(int sample_index) const {
    return missing_[sample_index];
  }

  bool sample_call_missing(const std::string& sample) const;

  void get_INFO_value_single_int(const std::string& fieldname,
                                 int32_t& val) const {
    auto it = info_.find(fieldname);
    if (it == info_.end() || it->second.empty() ||
        stub_detail::split(it->second, ',').size() != 1)
      printErrorAndDie("Failed to extract single INFO value from the VCF "
                       "record");
    val = (int32_t)atol(it->second.c_str());
  }

  void get_INFO_value_multiple_ints(const std::string& fieldname,
                                    std::vector<int32_t>& vals) const {
    vals.clear();
    auto it = info_.find(fieldname);
    if (it == info_.end())
      printErrorAndDie("Failed to extract multiple INFO values from the VCF "
                       "record");
    std::vector<std::string> parts = stub_detail::split(it->second, ',');
    if (parts.size() <= 1)
      printErrorAndDie("Failed to extract multiple INFO values from the VCF "
                       "record");
    for (const std::string& p : parts)
      vals.push_back((int32_t)atol(p.c_str()));
  }

  // GL-type fields are C floats in htslib (vcf_reader.h:133-148):
  // text -> float32, per-sample vectors of the same width.  Samples whose
  // field is '.' get quiet-NaN fills (htslib's missing/vector_end bit
  // patterns are NaNs); reference code never reads them because it skips
  // GT-missing samples first.
  void get_FORMAT_value_multiple_floats(
      const std::string& fieldname,
      std::vector<std::vector<float> >& vals) const {
    vals.clear();
    auto it = format_.find(fieldname);
    if (it == format_.end())
      printErrorAndDie("Failed to extract multiple FORMAT values from the "
                       "VCF record");
    size_t per_sample = 1;
    std::vector<std::vector<float> > parsed(num_samples_);
    for (int s = 0; s < num_samples_; s++) {
      const std::string& raw = it->second[s];
      if (raw == ".") continue;
      for (const std::string& p : stub_detail::split(raw, ','))
        parsed[s].push_back((float)atof(p.c_str()));
      per_sample = std::max(per_sample, parsed[s].size());
    }
    if ((int)(per_sample * num_samples_) <= num_samples_)
      printErrorAndDie("Failed to extract multiple FORMAT values from the "
                       "VCF record");
    for (int s = 0; s < num_samples_; s++) {
      parsed[s].resize(per_sample,
                       std::numeric_limits<float>::quiet_NaN());
      vals.push_back(parsed[s]);
    }
  }

  void get_genotype(const std::string& sample, int& gt_a, int& gt_b) const;

  void get_genotype(int sample_index, int& gt_a, int& gt_b) const {
    gt_a = gt_1_[sample_index];
    gt_b = gt_2_[sample_index];
  }
};

// Plain-text replacement for the htslib/tabix-backed reader
// (vcf_reader.cpp:75-141).  Record intervals follow the tabix VCF preset:
// [POS, POS+len(REF)-1], overridden by INFO END= when present (tbx.c).
class VCFReader {
 private:
  struct Rec {
    int64_t beg1, end1;
    std::string line;
  };

  std::vector<std::string> chroms_;
  std::map<std::string, std::vector<Rec> > recs_;
  std::vector<std::string> samples_;
  std::map<std::string, int> sample_indices_;

  // iterator state (mirrors tbx_iter_ + jumped_ + chrom_index_)
  bool it_valid_;
  std::string it_chrom_;
  size_t it_next_;
  int64_t it_beg1_, it_end1_;
  bool jumped_;
  int chrom_index_;

  void start_chrom_iter(const std::string& chrom) {
    it_valid_ = true;
    it_chrom_ = chrom;
    it_next_ = 0;
    it_beg1_ = 1;
    it_end1_ = std::numeric_limits<int64_t>::max();
  }

  bool iter_next(std::string& line) {
    if (!it_valid_) return false;
    auto it = recs_.find(it_chrom_);
    if (it == recs_.end()) return false;
    const std::vector<Rec>& v = it->second;
    while (it_next_ < v.size()) {
      const Rec& r = v[it_next_++];
      if (r.beg1 > it_end1_) return false;  // sorted: nothing later overlaps
      if (r.end1 >= it_beg1_) {
        line = r.line;
        return true;
      }
    }
    return false;
  }

  void open(const std::string& filename) {
    std::ifstream in(filename.c_str());
    if (!in.is_open())
      printErrorAndDie("Failed to open the VCF file");
    std::string line;
    while (std::getline(in, line)) {
      if (line.empty()) continue;
      if (line[0] == '#') {
        if (line.rfind("#CHROM", 0) == 0) {
          std::vector<std::string> cols = stub_detail::split(line, '\t');
          for (size_t i = 9; i < cols.size(); i++) {
            samples_.push_back(cols[i]);
            sample_indices_[cols[i]] = (int)(i - 9);
          }
        }
        continue;
      }
      std::vector<std::string> cols = stub_detail::split(line, '\t');
      if (cols.size() < 8)
        printErrorAndDie("Failed to parse VCF record");
      Rec r;
      r.beg1 = atol(cols[1].c_str());
      r.end1 = r.beg1 + (int64_t)std::max<size_t>(1, cols[3].size()) - 1;
      if (cols.size() > 7 && cols[7] != ".") {  // tabix INFO END= override
        for (const std::string& kv : stub_detail::split(cols[7], ';'))
          if (kv.rfind("END=", 0) == 0)
            r.end1 = atol(kv.c_str() + 4);
      }
      r.line = line;
      if (recs_.find(cols[0]) == recs_.end())
        chroms_.push_back(cols[0]);
      recs_[cols[0]].push_back(r);
    }
    if (chroms_.empty())
      printErrorAndDie("VCF does not contain any chromosomes");
    start_chrom_iter(chroms_.front());
    chrom_index_ = 0;
  }

 public:
  // The real class has no default constructor; the oracle keeps one for the
  // dummy ref-VCF pointer routing (see wrapper.cc) — a default-constructed
  // reader has no records and yields nothing.
  VCFReader() {
    it_valid_ = false;
    jumped_ = false;
    chrom_index_ = 0;
    it_next_ = 0;
    it_beg1_ = 0;
    it_end1_ = 0;
  }

  explicit VCFReader(const std::string& filename) {
    it_valid_ = false;
    jumped_ = false;
    chrom_index_ = 0;
    it_next_ = 0;
    it_beg1_ = 0;
    it_end1_ = 0;
    open(filename);
  }

  bool has_sample(const std::string& sample) const {
    return sample_indices_.find(sample) != sample_indices_.end();
  }

  bool has_chromosome(const std::string& chrom) const {
    return recs_.find(chrom) != recs_.end();
  }

  int get_sample_index(const std::string& sample) const {
    auto it = sample_indices_.find(sample);
    return it == sample_indices_.end() ? -1 : it->second;
  }

  bool set_region(const std::string& chrom, int32_t start, int32_t end = 0) {
    jumped_ = true;
    if (recs_.find(chrom) == recs_.end()) {
      it_valid_ = false;
      return false;  // tbx_itr_querys fails only on unknown chromosomes
    }
    it_valid_ = true;
    it_chrom_ = chrom;
    it_next_ = 0;
    it_beg1_ = std::max<int64_t>(1, start);
    it_end1_ = end ? end : std::numeric_limits<int64_t>::max();
    return true;
  }

  const std::vector<std::string>& get_samples() const { return samples_; }

  bool get_next_variant(Variant& variant) {
    std::string line;
    if (iter_next(line)) {
      variant.parse(line, this, (int)samples_.size());
      return true;
    }
    if (jumped_) return false;
    while (chrom_index_ + 1 < (int)chroms_.size()) {
      chrom_index_++;
      start_chrom_iter(chroms_[chrom_index_]);
      if (iter_next(line)) {
        variant.parse(line, this, (int)samples_.size());
        return true;
      }
    }
    return false;
  }
};

inline const std::vector<std::string>& Variant::get_samples() const {
  return vcf_reader_->get_samples();
}

inline void Variant::get_genotype(const std::string& sample, int& gt_a,
                                  int& gt_b) const {
  int sample_index = vcf_reader_->get_sample_index(sample);
  if (sample_index == -1)
    gt_a = gt_b = -1;
  else {
    gt_a = gt_1_[sample_index];
    gt_b = gt_2_[sample_index];
  }
}

inline bool Variant::sample_call_missing(const std::string& sample) const {
  int sample_index = vcf_reader_->get_sample_index(sample);
  return sample_index == -1 ? true : missing_[sample_index];
}

}  // namespace VCF

// Capturing stand-in for the reference VCFWriter: stores (pos, text) pairs
// in the order add_vcf_record was called.  The open/header surface is
// no-op (oracle drivers read records_ directly, never a file).
class VCFWriter {
 public:
  std::vector<int32_t> positions_;
  std::vector<std::string> chroms_;
  std::vector<std::string> records_;
  bool open_ = false;

  void add_vcf_record(const std::string& chrom, int32_t record_pos,
                      const std::string& record_text) {
    chroms_.push_back(chrom);
    positions_.push_back(record_pos);
    records_.push_back(record_text);
  }
  bool is_open() const { return open_; }
  void open(const std::string&) { open_ = true; }
  void write_header(const std::string&) {}
  void close() { open_ = false; }
};

// bgzf_streams.h stand-in (guard predefined above): the DenovoFinder
// scanners open their output VCF through bgzfostream; writing plain text
// lets parity tests diff the file directly.
class bgzfostream : public std::ofstream {
 public:
  bgzfostream() {}
  explicit bgzfostream(const char* path) { open(path); }
};

// The real pedigree.h compiles against the VCF stubs above and provides
// NuclearFamily for snp_bam_processor.h and the DenovoFinder chain.
#include "pedigree.h"

#endif

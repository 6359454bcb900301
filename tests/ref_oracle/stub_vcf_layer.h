// Interop shim #2 for the reference-source oracle build (tests only).
//
// Round 3 compiles the reference's full genotyping + VCF-emission chain
// (seq_stutter_genotyper.cpp, em_stutter_genotyper.cpp) into the oracle.
// Those translation units include headers that are htslib-backed and cannot
// compile here: vcf_reader.h, vcf_writer.h, bam_processor.h,
// haplotype_tracker.h.  Force-including this header predefines their include
// guards so their bodies are skipped, and supplies the minimal declarations
// the compiled sources actually touch:
//
//  - VCF::VCFReader / VCF::Variant: opaque; seq_stutter_genotyper only holds
//    a VCFReader* (oracle always passes NULL) and vcf_input.h's inline GL
//    constructors call Variant::has_format_field
//    (/root/reference/src/vcf_input.h:55-91).
//  - VCFWriter: the real one heap-buffers record text and bgzf-compresses it
//    (/root/reference/src/vcf_writer.h:25-88).  write_vcf_record's only
//    interaction is add_vcf_record(chrom, pos, text)
//    (/root/reference/src/seq_stutter_genotyper.cpp:1396) — the stub captures
//    the uncompressed record text so parity tests can diff it byte-for-byte.
//  - HaplotypeTracker: forward-declared; only appears as a pointer parameter
//    in snp_tree.h's create_snp_trees declaration.
//  - bam_processor.h compiles for real since round 3 (the stub BamAlignment/
//    BamWriter/BamCramMultiReader in stub_bam_io.h carry its data needs), so
//    the compiled read_and_filter_reads chain is drivable from tests.
#ifndef REF_ORACLE_STUB_VCF_LAYER_H_
#define REF_ORACLE_STUB_VCF_LAYER_H_

#define VCF_READER_H_
#define VCF_WRITER_H_
#define HAPLOTYPE_TRACKER_H_

#include <cstdint>
#include <cstdlib>
#include <set>
#include <string>
#include <vector>

namespace VCF {

class Variant {
 public:
  bool has_format_field(const std::string&) const { return false; }
  bool sample_call_missing(int) const { abort(); }
  void get_genotype(int, int&, int&) const { abort(); }
};

class VCFReader {
 public:
  VCFReader() {}
  explicit VCFReader(const std::string&) { abort(); }
  bool has_chromosome(const std::string&) const { return false; }
  bool has_sample(const std::string&) const { return false; }
  int get_sample_index(const std::string&) const { return -1; }
  const std::vector<std::string>& get_samples() const { return samples_; }

 private:
  std::vector<std::string> samples_;
};

}  // namespace VCF

// Minimal stand-in: only ever NULL in oracle-driven paths; the members are
// declared because snp/genotyper processors reference them behind NULL
// checks (the templated ctor avoids naming NuclearFamily, which the real
// pedigree.h defines later in the include order).
class HaplotypeTracker {
 public:
  HaplotypeTracker() {}
  template <class Families>
  HaplotypeTracker(const Families&, const std::string&, int32_t) {
    abort();
  }
  void advance(const std::string&, int32_t, const std::set<std::string>&) {
    abort();
  }
};

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

// The real pedigree.h compiles against the VCF stubs above and provides
// NuclearFamily for snp_bam_processor.h (whose own include chain gets it
// via the guard-stubbed haplotype_tracker.h).
#include "pedigree.h"

#endif

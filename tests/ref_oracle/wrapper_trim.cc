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

// Test-only access promotion (bases_/qualities_/cigar_ops_ are private, and
// GenotyperBamProcessor::left_align_reads below is private); GCC does not
// reorder members by access specifier.
#define private public
#include "bam_io.h"
#include "genotyper_bam_processor.h"
#undef private

#include "snp_tree.h"

// vcf/snp-tree externs live in htslib-backed TUs not compiled here; the
// oracle drives NULL-VCF paths only.
bool read_vcf_alleles(VCF::VCFReader*, const Region&,
                      std::vector<std::string>&, int32_t&) {
  throw std::runtime_error("ref_trim: read_vcf_alleles stub called");
}
bool create_snp_trees(const std::string&, uint32_t, uint32_t,
                      const std::vector<Region>&, int32_t, VCF::VCFReader*,
                      HaplotypeTracker*, std::map<std::string, unsigned int>&,
                      std::vector<SNPTree*>&, std::ostream&) {
  throw std::runtime_error("ref_trim: create_snp_trees stub called");
}
void destroy_snp_trees(std::vector<SNPTree*>& snp_trees) {
  for (size_t i = 0; i < snp_trees.size(); i++) delete snp_trees[i];
  snp_trees.clear();
}

namespace {

class OracleGtProcessor : public GenotyperBamProcessor {
 public:
  OracleGtProcessor() : GenotyperBamProcessor(true, false) {
    suppress_all_logging();
  }
};

}  // namespace

extern "C" {

// Drive the REAL GenotyperBamProcessor::left_align_reads
// (genotyper_bam_processor.cpp:38-168): trim + per-base CIGAR expansion
// vs the chromosome + soft-clip discard + <DEL> alignments + HP counting.
// Output entries (NUL-separated after the header line):
//   "<start>,<stop>,<rev>,<del>,<name>|<seq>|<quals>|<alnstr>|<cigar>|<ufh>"
// Header: "n_aln f1:... f2:... np1:... np2:..." (per-sample retained
// log-index lists + HP counts).
__attribute__((visibility("default")))
int rt_left_align(
    const char* chrom_seq, const char* region_chrom, int32_t region_start,
    int32_t region_end, const char* motif, int n_samples,
    const int32_t* reads_per_sample,
    const char* seq_concat, const int32_t* seq_lens, const char* qual_concat,
    const int32_t* qual_lens, const char* name_concat,
    const int32_t* name_lens, const char* cigar_concat,
    const int32_t* cigar_lens, const int32_t* pos, const int32_t* end_pos,
    const uint8_t* reverse, const int32_t* hp_tag /* 0 = absent */,
    const char* pf_concat, const int32_t* pf_lens,
    const double* log_p1_flat, const double* log_p2_flat, char* out,
    long cap) {
  try {
    Region region(std::string(region_chrom), region_start, region_end,
                  std::string(motif));
    RegionGroup group(region);
    std::vector<std::vector<BamAlignment> > alns(n_samples);
    std::vector<std::vector<double> > p1(n_samples), p2(n_samples);
    const char* sp = seq_concat;
    const char* qp = qual_concat;
    const char* np = name_concat;
    const char* cp = cigar_concat;
    const char* pp = pf_concat;
    int idx = 0;
    for (int s = 0; s < n_samples; s++) {
      for (int k = 0; k < reads_per_sample[s]; k++, idx++) {
        BamAlignment a;
        a.built_ = true;
        a.bases_.assign(sp, sp + seq_lens[idx]);
        sp += seq_lens[idx];
        a.qualities_.assign(qp, qp + qual_lens[idx]);
        qp += qual_lens[idx];
        a.length_ = (int32_t)a.bases_.size();
        a.b_->qname.assign(np, np + name_lens[idx]);
        np += name_lens[idx];
        std::string cig(cp, cp + cigar_lens[idx]);
        cp += cigar_lens[idx];
        size_t j = 0;
        while (j < cig.size()) {
          size_t j2 = j;
          while (j2 < cig.size() && isdigit(cig[j2])) j2++;
          a.cigar_ops_.push_back(
              CigarOp(cig[j2], atoi(cig.substr(j, j2 - j).c_str())));
          j = j2 + 1;
        }
        a.pos_ = pos[idx];
        a.end_pos_ = end_pos[idx];
        if (reverse[idx]) a.b_->core.flag |= BAM_FREVERSE;
        if (hp_tag[idx]) {
          int64_t v = hp_tag[idx];
          bam_aux_append(a.b_, "HP", 'i', sizeof v, (const uint8_t*)&v);
        }
        std::string pf(pp, pp + pf_lens[idx]);
        pp += pf_lens[idx];
        a.AddStringTag("PF", pf);
        alns[s].push_back(a);
        p1[s].push_back(log_p1_flat[idx]);
        p2[s].push_back(log_p2_flat[idx]);
      }
    }

    OracleGtProcessor gt;
    std::vector<std::vector<double> > f1, f2;
    std::vector<int> np1, np2;
    std::vector<Alignment> left_alns;
    gt.left_align_reads(group, std::string(chrom_seq), alns, p1, p2, f1, f2,
                        np1, np2, left_alns);

    std::ostringstream hdr;
    hdr.precision(17);
    hdr << left_alns.size();
    hdr << " f1";
    for (size_t s = 0; s < f1.size(); s++)
      for (size_t j = 0; j < f1[s].size(); j++)
        hdr << " " << s << ":" << f1[s][j];
    hdr << " np1";
    for (size_t s = 0; s < np1.size(); s++) hdr << " " << np1[s];
    hdr << " np2";
    for (size_t s = 0; s < np2.size(); s++) hdr << " " << np2[s];
    std::string htext = hdr.str();
    if ((long)htext.size() + 1 > cap) return -4;
    memcpy(out, htext.c_str(), htext.size() + 1);
    long off = (long)htext.size() + 1;
    for (size_t i = 0; i < left_alns.size(); i++) {
      Alignment& a = left_alns[i];
      std::ostringstream rec;
      rec << a.get_start() << "," << a.get_stop() << ","
          << (a.is_from_reverse_strand() ? 1 : 0) << ","
          << (a.get_deleted() ? 1 : 0) << "," << a.get_name() << "|"
          << a.get_sequence() << "|" << a.get_base_qualities() << "|"
          << a.get_alignment() << "|";
      const std::vector<CigarElement>& cl = a.get_cigar_list();
      for (size_t j = 0; j < cl.size(); j++)
        rec << cl[j].get_num() << cl[j].get_type();
      rec << "|";
      for (int r = 0; r < group.num_regions(); r++)
        rec << (a.use_for_hap_generation(r) ? '1' : '0');
      std::string rtext = rec.str();
      if (off + (long)rtext.size() + 1 > cap) return -4;
      memcpy(out + off, rtext.c_str(), rtext.size() + 1);
      off += (long)rtext.size() + 1;
    }
    return (int)left_alns.size();
  } catch (const std::exception& e) {
    std::string msg = std::string("EXC:") + e.what();
    if ((long)msg.size() + 1 <= cap) memcpy(out, msg.c_str(), msg.size() + 1);
    return -1;
  }
}

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

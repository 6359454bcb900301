// Interop shim: fasta_reader.h wraps htslib faidx (absent here).  Force-
// including this predefines its guard so the real header is skipped, and
// provides the minimal surface genotyper.cpp's get_vcf_header references
// (never called by the oracle wrappers).
#ifndef FASTA_READER_H_
#define FASTA_READER_H_

#include <ostream>
#include <string>

class FastaReader {
 public:
  explicit FastaReader(const std::string&) {}
  void write_all_contigs_to_vcf(std::ostream&) {}
  // bam_processor.cpp's verify_chromosomes / process_regions surface
  // (never invoked by the oracle wrappers, which drive
  // read_and_filter_reads directly)
  long get_sequence_length(const std::string&) { return 1; }
  void get_sequence(const std::string&, std::string& out) { out = "N"; }
};

#endif

// Compiles the REAL reference vcf_input.cpp (the UnphasedGL/PhasedGL
// builders the DenovoFinder chain uses, plus the GL/PHASEDGL key globals)
// into the oracle, with one rename: wrapper.cc keeps its injection-based
// read_vcf_alleles stub for the --ref-vcf replay flows
// (seq_stutter_genotyper.cpp:439-452), so this TU's real definition is
// renamed out of the way instead of colliding at link time.  The rename is
// TU-local; every other translation unit still binds read_vcf_alleles to
// the wrapper's stub.
#define read_vcf_alleles ro_real_read_vcf_alleles
#include "vcf_input.cpp"

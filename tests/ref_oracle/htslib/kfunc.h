// Stub htslib/kfunc.h for the reference-source oracle build (tests only).
//
// seq_stutter_genotyper.cpp calls kt_fisher_exact for the strand-bias FS
// statistic (/root/reference/src/seq_stutter_genotyper.cpp:1245-1255), but
// the result is dead: output_strand_bias is hardcoded false (:1168) so the
// value never reaches the emitted record.  The stub returns neutral 1.0
// p-values; a parity mismatch would surface immediately if the flag were
// ever flipped on, since the real function is not reproduced here.
#ifndef HTSLIB_KFUNC_H
#define HTSLIB_KFUNC_H

static inline double kt_fisher_exact(int n11, int n12, int n21, int n22,
                                     double* _left, double* _right,
                                     double* two) {
  (void)n11; (void)n12; (void)n21; (void)n22;
  *_left = *_right = *two = 1.0;
  return 1.0;
}

#endif

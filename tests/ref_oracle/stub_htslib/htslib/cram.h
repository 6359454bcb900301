// Minimal htslib cram.h stand-in for the trim-oracle build (tests only).
#ifndef HTSLIB_CRAM_H
#define HTSLIB_CRAM_H
#endif

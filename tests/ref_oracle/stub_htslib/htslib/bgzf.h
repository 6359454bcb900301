// Minimal htslib bgzf.h stand-in for the trim-oracle build (tests only).
#ifndef HTSLIB_BGZF_H
#define HTSLIB_BGZF_H
#include <cstdlib>
typedef struct BGZF BGZF;
static inline BGZF* bgzf_open(const char*, const char*) { abort(); }
static inline int bgzf_close(BGZF*) { return 0; }
static inline long bgzf_write(BGZF*, const void*, long) { abort(); }
static inline long bgzf_tell(BGZF*) { abort(); }
static inline int bgzf_getc(BGZF*) { abort(); }
static inline int bgzf_seek(BGZF*, long, int) { abort(); }
#endif

// Minimal htslib sam.h stand-in for the trim-oracle build (tests only).
//
// Purpose: compile the reference's bam_io.cpp IN PLACE so that
// BamAlignment::TrimAlignment — the one htslib-file function the main
// oracle cannot reach — runs as compiled reference code.  Only the data
// surface bam_io.{h,cpp} actually touches is provided; every IO-facing
// function aborts if called (the trim driver never opens files).  The tag
// (aux) system is functional because AddStringTag/GetIntTag are exercised
// by the trimmed-alignment path.
#ifndef HTSLIB_SAM_H
#define HTSLIB_SAM_H

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <list>
#include <map>
#include <string>

// --- flags (values as in htslib) ---
#define BAM_FPAIRED 1
#define BAM_FPROPER_PAIR 2
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024
#define BAM_FSUPPLEMENTARY 2048

typedef struct {
  int32_t tid;
  int32_t pos;
  uint16_t flag;
  uint8_t qual;
  int32_t l_qseq;
  uint32_t n_cigar;
  int32_t mtid;
  int32_t mpos;
  int32_t isize;
} bam1_core_t;

// C++-backed record: qname + a functional aux-tag store.  Encoded aux
// values live in a std::list so returned pointers stay stable.
typedef struct bam1_t {
  bam1_core_t core;
  std::string qname;
  std::map<std::string, std::list<std::string>::iterator> aux_index;
  std::list<std::string> aux_store;
} bam1_t;

typedef struct {
  int32_t n_targets;
  char** target_name;
  uint32_t* target_len;
  char* text;
} bam_hdr_t;

typedef struct samFile {
  int is_cram;
} samFile;
typedef samFile htsFile;
typedef struct hts_idx_t hts_idx_t;
typedef struct hts_pair64_t {
  uint64_t u, v;
} hts_pair64_t;
typedef struct hts_itr_t {
  int n_off;
  hts_pair64_t* off;
  long curr_off;
} hts_itr_t;

static inline bam1_t* bam_init1() { return new bam1_t(); }
static inline void bam_destroy1(bam1_t* b) { delete b; }
static inline int bam_copy1(bam1_t* dst, const bam1_t* src) {
  dst->core = src->core;
  dst->qname = src->qname;
  dst->aux_index.clear();
  dst->aux_store.clear();
  for (auto it = src->aux_store.begin(); it != src->aux_store.end(); ++it) {
    dst->aux_store.push_back(*it);
    auto nit = dst->aux_store.end();
    --nit;
    dst->aux_index[nit->substr(0, 2)] = nit;
  }
  return 0;
}

static inline char* bam_get_qname(const bam1_t* b) {
  return (char*)b->qname.c_str();
}
static inline int32_t bam_endpos(const bam1_t* b) { return b->core.pos; }

// aux encoding: "<2-char tag><type byte><payload>"
static inline uint8_t* bam_aux_get(const bam1_t* b, const char tag[2]) {
  auto it = b->aux_index.find(std::string(tag, 2));
  if (it == b->aux_index.end()) return NULL;
  return (uint8_t*)(it->second->data() + 2);
}
static inline int bam_aux_append(bam1_t* b, const char tag[2], char type,
                                 int len, const uint8_t* data) {
  std::string enc(tag, 2);
  enc.push_back(type);
  enc.append((const char*)data, len);
  b->aux_store.push_back(enc);
  auto nit = b->aux_store.end();
  --nit;
  b->aux_index[std::string(tag, 2)] = nit;
  return 0;
}
static inline int bam_aux_del(bam1_t* b, uint8_t* data) {
  for (auto it = b->aux_index.begin(); it != b->aux_index.end(); ++it) {
    if ((uint8_t*)(it->second->data() + 2) == data) {
      b->aux_store.erase(it->second);
      b->aux_index.erase(it);
      return 0;
    }
  }
  return -1;
}
static inline char bam_aux2A(const uint8_t* d) { return (char)d[1]; }
static inline int64_t bam_aux2i(const uint8_t* d) {
  int64_t v;
  memcpy(&v, d + 1, sizeof v);
  return v;
}
static inline double bam_aux2f(const uint8_t* d) {
  double v;
  memcpy(&v, d + 1, sizeof v);
  return v;
}
static inline char* bam_aux2Z(const uint8_t* d) { return (char*)(d + 1); }

// sequence/qual/cigar accessors: only reachable via ExtractSequenceFields,
// which the trim driver never triggers (built_ is pre-set)
static inline uint8_t* bam_get_seq(const bam1_t*) { abort(); }
static inline uint8_t* bam_get_qual(const bam1_t*) { abort(); }
static inline uint32_t* bam_get_cigar(const bam1_t*) { abort(); }
#define bam_seqi(s, i) ((s)[0])
#define bam_cigar_opchr(c) ('M')
#define bam_cigar_oplen(c) ((c) >> 4)

// --- IO surface: abort if ever reached ---
static inline samFile* sam_open(const char*, const char*) { abort(); }
static inline int sam_close(samFile*) { abort(); }
static inline bam_hdr_t* sam_hdr_read(samFile*) { abort(); }
static inline hts_idx_t* sam_index_load(samFile*, const char*) { abort(); }
static inline hts_itr_t* sam_itr_querys(const hts_idx_t*, bam_hdr_t*,
                                        const char*) {
  abort();
}
static inline int sam_itr_next(samFile*, hts_itr_t*, bam1_t*) { abort(); }
static inline void hts_idx_destroy(hts_idx_t*) {}
static inline void hts_itr_destroy(hts_itr_t*) {}
static inline int hts_set_fai_filename(samFile*, const char*) { abort(); }
static inline void bam_hdr_destroy(bam_hdr_t*) {}
static inline int bam_hdr_write(void*, const bam_hdr_t*) { abort(); }
static inline int bam_write1(void*, const bam1_t*) { abort(); }

#endif

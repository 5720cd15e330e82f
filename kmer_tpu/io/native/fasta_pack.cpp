// Native FASTA parser + 2-bit packer (host ingest layer).
//
// TPU-native replacement for the reference's only native layer — the Rust
// bio::io::fasta reader + String handling (k-mer-count/src/main.rs:44-62).
// Parses a FASTA file in one streaming pass and emits bases as 2-bit codes
// (A=0,C=1,G=2,T=3, lowercase accepted) into a caller-provided buffer, plus
// per-record offsets, so Python/JAX sees only fixed-dtype integer arrays.
// Non-ACGT bases are a clean error with file offset (the reference panics
// instead: main.rs:23).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: see Makefile (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

// byte -> code; 0xFF invalid, 0xFE newline/whitespace (skipped in
// sequence), 0x04 IUPAC ambiguity code (N etc.) — accepted as the
// "unknown base" marker when the caller opts in (skip_invalid mode;
// windows containing it are masked out downstream).
struct Lut {
  uint8_t m[256];
  constexpr Lut() : m() {
    for (int i = 0; i < 256; ++i) m[i] = 0xFF;
    m[(int)'A'] = 0; m[(int)'a'] = 0;
    m[(int)'C'] = 1; m[(int)'c'] = 1;
    m[(int)'G'] = 2; m[(int)'g'] = 2;
    m[(int)'T'] = 3; m[(int)'t'] = 3;
    const char* iupac = "NRYKMSWBDHVUnrykmswbdhvu";
    for (const char* p = iupac; *p; ++p) m[(int)(unsigned char)*p] = 0x04;
    m[(int)'\n'] = 0xFE; m[(int)'\r'] = 0xFE;
    m[(int)' '] = 0xFE;  m[(int)'\t'] = 0xFE;
  }
};
constexpr Lut kLut;

void set_err(char* err, int64_t cap, const char* msg, int64_t pos) {
  if (err && cap > 0) snprintf(err, (size_t)cap, "%s (file offset %lld)", msg, (long long)pos);
}

constexpr size_t kChunk = 1 << 20;  // 1 MiB streaming reads

}  // namespace

extern "C" {

// Pass 1: sizes only (record and base counts; validates alphabet).
// Returns 0 on success, negative error code otherwise:
//   -1 file open failure        -3 invalid base
//   -2 data before first header -4 buffer overflow (caller bug)
int fasta_scan(const char* path, int allow_ambiguous,
               int64_t* n_records, int64_t* total_bases,
               char* err, int64_t errcap) {
  FILE* f = fopen(path, "rb");
  if (!f) { set_err(err, errcap, "cannot open file", 0); return -1; }

  int64_t nrec = 0, nbase = 0, fpos = 0;
  bool in_header = false, at_line_start = true, seen_record = false;
  int rc = 0;
  static thread_local uint8_t buf[kChunk];
  size_t got;
  while ((got = fread(buf, 1, kChunk, f)) > 0) {
    size_t i = 0;
    while (i < got) {
      uint8_t ch = buf[i];
      if (in_header) {
        const void* nl = memchr(buf + i, '\n', got - i);
        size_t adv = nl ? (size_t)((const uint8_t*)nl - (buf + i)) + 1 : got - i;
        i += adv; fpos += adv;
        if (nl) { in_header = false; at_line_start = true; }
        continue;
      }
      if (at_line_start && ch == '>') {
        ++nrec;
        seen_record = true;
        in_header = true; at_line_start = false;
        ++i; ++fpos;
        continue;
      }
      at_line_start = (ch == '\n');
      uint8_t code = kLut.m[ch];
      ++i; ++fpos;
      if (code == 0xFE) continue;
      if (code == 0xFF || (code == 0x04 && !allow_ambiguous)) { set_err(err, errcap, "invalid base", fpos - 1); rc = -3; goto done; }
      if (!seen_record) { set_err(err, errcap, "sequence data before first FASTA header", fpos - 1); rc = -2; goto done; }
      ++nbase;
    }
  }
done:
  fclose(f);
  if (rc == 0) {
    *n_records = nrec;
    *total_bases = nbase;
  }
  return rc;
}

// Pass 2: fill codes (cap = total_bases) and offsets (cap = n_records+1).
// offsets[r] = start index of record r in codes; offsets[n_records] = total.
int fasta_parse(const char* path, int allow_ambiguous,
                uint8_t* codes, int64_t codes_cap,
                int64_t* offsets, int64_t offsets_cap,
                int64_t* n_records, int64_t* total_bases,
                char* err, int64_t errcap) {
  FILE* f = fopen(path, "rb");
  if (!f) { set_err(err, errcap, "cannot open file", 0); return -1; }

  int64_t nrec = 0, nbase = 0, fpos = 0;
  bool in_header = false, at_line_start = true, seen_record = false;
  int rc = 0;
  static thread_local uint8_t buf[kChunk];
  size_t got;
  while ((got = fread(buf, 1, kChunk, f)) > 0) {
    size_t i = 0;
    while (i < got) {
      uint8_t ch = buf[i];
      if (in_header) {
        // skip to end of header line
        const void* nl = memchr(buf + i, '\n', got - i);
        size_t adv = nl ? (size_t)((const uint8_t*)nl - (buf + i)) + 1 : got - i;
        i += adv; fpos += adv;
        if (nl) { in_header = false; at_line_start = true; }
        continue;
      }
      if (at_line_start && ch == '>') {
        if (nrec >= offsets_cap - 1) { rc = -4; goto done; }
        offsets[nrec] = nbase;  // start of this record
        ++nrec;
        seen_record = true;
        in_header = true; at_line_start = false;
        ++i; ++fpos;
        continue;
      }
      at_line_start = (ch == '\n');
      uint8_t code = kLut.m[ch];
      ++i; ++fpos;
      if (code == 0xFE) continue;
      if (code == 0xFF || (code == 0x04 && !allow_ambiguous)) { set_err(err, errcap, "invalid base", fpos - 1); rc = -3; goto done; }
      if (!seen_record) { set_err(err, errcap, "sequence data before first FASTA header", fpos - 1); rc = -2; goto done; }
      if (nbase >= codes_cap) { rc = -4; goto done; }
      codes[nbase++] = code;
    }
  }
done:
  fclose(f);
  if (rc == 0) {
    offsets[nrec] = nbase;
    *n_records = nrec;
    *total_bases = nbase;
  }
  return rc;
}

// Pack 2-bit codes into uint32 words, 16 bases per word, first base in the
// most-significant bit pair (matches ops/encode.py key layout).  n_words
// must be ceil(n/16); trailing bases of the last word are zero-padded.
void pack_codes_u32(const uint8_t* codes, int64_t n, uint32_t* out) {
  int64_t n_words = (n + 15) / 16;
  for (int64_t w = 0; w < n_words; ++w) {
    uint32_t acc = 0;
    int64_t base = w * 16;
    int64_t lim = (base + 16 <= n) ? 16 : (n - base);
    for (int64_t j = 0; j < lim; ++j)
      acc |= (uint32_t)(codes[base + j] & 3) << (2 * (15 - j));
    out[w] = acc;
  }
}

// ---------------------------------------------------------------------------
// FASTQ (4-line records: @hdr / seq / + / qual).  Sequence may wrap
// across lines; quality is consumed by LENGTH (qual bytes == seq bases),
// never by sentinel — '@' is a legal quality character.
// ---------------------------------------------------------------------------

namespace {

enum class FqState { kHeader, kSeq, kPlus, kQual };

struct FqCallbacks {
  int64_t* nrec;
  int64_t* nbase;
  uint8_t* codes;      // may be null (scan pass)
  int64_t codes_cap;
  int64_t* offsets;    // may be null (scan pass)
  int64_t offsets_cap;
};

int fastq_walk(const char* path, int allow_ambiguous, FqCallbacks cb,
               char* err, int64_t errcap) {
  FILE* f = fopen(path, "rb");
  if (!f) { set_err(err, errcap, "cannot open file", 0); return -1; }
  FqState st = FqState::kHeader;
  int64_t nrec = 0, nbase = 0, fpos = 0, seq_len = 0, qual_seen = 0;
  bool at_line_start = true, hdr_started = false;
  int rc = 0;
  static thread_local uint8_t buf[kChunk];
  size_t got;
  while ((got = fread(buf, 1, kChunk, f)) > 0) {
    size_t i = 0;
    while (i < got) {
      uint8_t ch = buf[i];
      if (st == FqState::kHeader) {
        if (!hdr_started) {
          if (ch == '\n' || ch == '\r') { ++i; ++fpos; continue; }
          if (ch != '@') { set_err(err, errcap, "FASTQ record must start with '@'", fpos); rc = -2; goto done; }
          hdr_started = true;
        }
        const void* nl = memchr(buf + i, '\n', got - i);
        size_t adv = nl ? (size_t)((const uint8_t*)nl - (buf + i)) + 1 : got - i;
        i += adv; fpos += adv;
        if (nl) {
          hdr_started = false;
          if (cb.offsets) {
            if (nrec >= cb.offsets_cap - 1) { rc = -4; goto done; }
            cb.offsets[nrec] = nbase;
          }
          ++nrec; seq_len = 0; qual_seen = 0;
          st = FqState::kSeq; at_line_start = true;
        }
        continue;
      }
      if (st == FqState::kSeq) {
        if (at_line_start && ch == '+') { st = FqState::kPlus; continue; }
        at_line_start = (ch == '\n');
        uint8_t code = kLut.m[ch];
        ++i; ++fpos;
        if (code == 0xFE) continue;
        if (code == 0xFF || (code == 0x04 && !allow_ambiguous)) { set_err(err, errcap, "invalid base", fpos - 1); rc = -3; goto done; }
        if (cb.codes) {
          if (nbase >= cb.codes_cap) { rc = -4; goto done; }
          cb.codes[nbase] = code;
        }
        ++nbase; ++seq_len;
        continue;
      }
      if (st == FqState::kPlus) {
        const void* nl = memchr(buf + i, '\n', got - i);
        size_t adv = nl ? (size_t)((const uint8_t*)nl - (buf + i)) + 1 : got - i;
        i += adv; fpos += adv;
        if (nl) {
          st = (seq_len == 0) ? FqState::kHeader : FqState::kQual;
          at_line_start = true;
        }
        continue;
      }
      // kQual: consume exactly seq_len non-newline bytes
      {
        if (ch == '\n' || ch == '\r') { ++i; ++fpos; continue; }
        int64_t want = seq_len - qual_seen;
        size_t run = got - i;
        const void* nl = memchr(buf + i, '\n', run);
        if (nl) run = (size_t)((const uint8_t*)nl - (buf + i));
        // CRLF: the '\r' before the newline is not a quality byte
        const void* cr = memchr(buf + i, '\r', run);
        if (cr) run = (size_t)((const uint8_t*)cr - (buf + i));
        if ((int64_t)run > want) { set_err(err, errcap, "quality longer than sequence", fpos); rc = -2; goto done; }
        qual_seen += (int64_t)run;
        i += run; fpos += (int64_t)run;
        if (qual_seen == seq_len) { st = FqState::kHeader; at_line_start = true; }
        continue;
      }
    }
  }
done:
  if (rc == 0 && (st != FqState::kHeader || hdr_started)) {
    set_err(err, errcap, "truncated FASTQ record", fpos);
    rc = -2;
  }
  fclose(f);
  if (rc == 0) {
    if (cb.offsets) cb.offsets[nrec] = nbase;
    *cb.nrec = nrec;
    *cb.nbase = nbase;
  }
  return rc;
}

}  // namespace

int fastq_scan(const char* path, int allow_ambiguous,
               int64_t* n_records, int64_t* total_bases,
               char* err, int64_t errcap) {
  FqCallbacks cb{n_records, total_bases, nullptr, 0, nullptr, 0};
  return fastq_walk(path, allow_ambiguous, cb, err, errcap);
}

int fastq_parse(const char* path, int allow_ambiguous,
                uint8_t* codes, int64_t codes_cap,
                int64_t* offsets, int64_t offsets_cap,
                int64_t* n_records, int64_t* total_bases,
                char* err, int64_t errcap) {
  FqCallbacks cb{n_records, total_bases, codes, codes_cap, offsets,
                 offsets_cap};
  return fastq_walk(path, allow_ambiguous, cb, err, errcap);
}

// Fill one fixed-shape device batch from parsed codes: for each span r
// (start, end, start_limit) copy codes[start:end) into row r of the
// zeroed (B, L) output and record its length/ownership limit.  Row
// memcpys run at memory bandwidth — the numpy gather this replaces cost
// ~10x the device step per batch.
void fill_batch(const uint8_t* codes, const int64_t* spans, int64_t m,
                uint8_t* out, int32_t* lens, int32_t* lims,
                int64_t B, int64_t L) {
  memset(out, 0, (size_t)(B * L));
  memset(lens, 0, (size_t)B * sizeof(int32_t));
  memset(lims, 0, (size_t)B * sizeof(int32_t));
  for (int64_t r = 0; r < m && r < B; ++r) {
    int64_t s = spans[3 * r], e = spans[3 * r + 1], lim = spans[3 * r + 2];
    int64_t n = e - s;
    if (n > L) n = L;
    if (n > 0) memcpy(out + r * L, codes + s, (size_t)n);
    lens[r] = (int32_t)n;
    lims[r] = (int32_t)lim;
  }
}

}  // extern "C"

// Native FASTA/FASTQ/gz chunk reader + 2-bit encoder.
//
// This is the TPU framework's equivalent of jellyfish's
// mer_overlap_sequence_parser (reference deps/jellyfish-2.2.0/include/
// jellyfish/mer_overlap_sequence_parser.hpp) + stream_manager
// (stream_manager.hpp): it streams records out of (optionally gzipped)
// FASTA/FASTQ files and packs their bases, already 2-bit encoded, densely
// into fixed-shape [rows, row_len] uint8 matrices for the device:
//
//   - records are concatenated with ONE invalid code (4) between them, so
//     k-windows never span records (the role of the parser's record
//     boundary handling);
//   - a record split across rows repeats its last (k-1) bases at the start
//     of the next row — the "seam" of mer_overlap_sequence_parser.hpp:44-52
//     — so no k-window is lost;
//   - rows are padded with code 5 (also invalid) only at end-of-file.
//
// Exposed as a tiny C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC fastxio.cpp -o libfastxio.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>

namespace {

constexpr int INVALID = 4;  // record separator / non-ACGT
constexpr int PAD = 5;      // end-of-stream padding

struct CodeLut {
  uint8_t lut[256];
  CodeLut() {
    std::memset(lut, INVALID, sizeof(lut));
    lut[static_cast<int>('A')] = 0;
    lut[static_cast<int>('a')] = 0;
    lut[static_cast<int>('C')] = 1;
    lut[static_cast<int>('c')] = 1;
    lut[static_cast<int>('G')] = 2;
    lut[static_cast<int>('g')] = 2;
    lut[static_cast<int>('T')] = 3;
    lut[static_cast<int>('t')] = 3;
  }
};
const CodeLut kLut;

struct Reader {
  gzFile f = nullptr;
  // buffered input
  static constexpr size_t BUF = 1 << 20;
  uint8_t buf[BUF];
  size_t pos = 0, len = 0;
  bool eof = false;

  int fmt = 0;  // 0 unknown, 1 fasta, 2 fastq
  // parser state machine
  enum State {
    AT_START,
    IN_HEADER,     // skipping a header line
    IN_SEQ,        // emitting sequence bytes
    IN_QUAL_SEP,   // skipping '+' line (fastq)
    IN_QUAL,       // skipping quality line (fastq)
  } state = AT_START;
  size_t seq_len = 0;   // bases seen in the current record
  size_t qual_len = 0;  // quality bytes still to skip == seq_len
  int trim_left = 0;    // per-file 5' trim
  int trim_remaining = 0;
  bool in_record = false;  // have emitted bases for current record

  // carry-over seam between rows: last (k-1) codes of a split record
  uint8_t seam[256];
  int seam_len = 0;

  bool fill() {
    if (eof) return pos < len;
    if (pos < len) return true;
    int n = gzread(f, buf, BUF);
    if (n <= 0) {
      eof = true;
      return false;
    }
    pos = 0;
    len = static_cast<size_t>(n);
    return true;
  }
  int peek() {
    if (!fill()) return -1;
    return buf[pos];
  }
  int get() {
    if (!fill()) return -1;
    return buf[pos++];
  }
};

}  // namespace

extern "C" {

void* kat_fastx_open(const char* path, int trim5) {
  gzFile f = gzopen(path, "rb");
  if (!f) return nullptr;
  gzbuffer(f, 1 << 20);
  Reader* r = new Reader();
  r->f = f;
  r->trim_left = trim5;
  int c = r->peek();
  if (c == '>') {
    r->fmt = 1;
  } else if (c == '@') {
    r->fmt = 2;
  } else {
    gzclose(f);
    delete r;
    return nullptr;
  }
  return r;
}

void kat_fastx_close(void* h) {
  Reader* r = static_cast<Reader*>(h);
  if (r) {
    gzclose(r->f);
    delete r;
  }
}

// Fill out[rows * row_len] with 2-bit codes, densely packed as described in
// the file header.  Returns the number of rows that contain at least one
// potential k-window (0 at EOF).  k must be < 256 and <= row_len.
int64_t kat_fastx_next_codes(void* h, int k, int64_t rows, int64_t row_len,
                             uint8_t* out) {
  Reader* r = static_cast<Reader*>(h);
  if (!r || k < 1 || k > 255 || row_len < k) return -1;

  int64_t row = 0;
  while (row < rows) {
    uint8_t* dst = out + row * row_len;
    int64_t col = 0;

    // Re-emit the seam from the previous row (same record continues).
    for (int i = 0; i < r->seam_len; ++i) dst[col++] = r->seam[i];
    r->seam_len = 0;

    while (col < row_len) {
      int c = r->get();
      if (c < 0) break;  // EOF
      switch (r->state) {
        case Reader::AT_START:
          // c is '>' or '@' (validated at open)
          r->state = Reader::IN_HEADER;
          r->in_record = false;
          r->seq_len = 0;
          r->trim_remaining = r->trim_left;
          break;
        case Reader::IN_HEADER:
          if (c == '\n') r->state = Reader::IN_SEQ;
          break;
        case Reader::IN_SEQ:
          if (c == '\n') {
            if (r->fmt == 2) {
              // FASTQ: single sequence line, then '+'
              r->state = Reader::IN_QUAL_SEP;
            }
            // FASTA: stay IN_SEQ (multi-line); header char handled below
          } else if (r->fmt == 1 && c == '>' && r->in_record == false &&
                     r->seq_len == 0) {
            // empty record, new header
            r->state = Reader::IN_HEADER;
          } else if (r->fmt == 1 && c == '>') {
            // new FASTA record: separate
            if (r->in_record && col < row_len) dst[col++] = INVALID;
            r->state = Reader::IN_HEADER;
            r->in_record = false;
            r->seq_len = 0;
            r->trim_remaining = r->trim_left;
          } else if (c != '\r') {
            if (r->trim_remaining > 0) {
              --r->trim_remaining;
              ++r->seq_len;
            } else {
              dst[col++] = kLut.lut[c];
              r->in_record = true;
              ++r->seq_len;
            }
          }
          break;
        case Reader::IN_QUAL_SEP:
          if (c == '\n') {
            r->state = Reader::IN_QUAL;
            r->qual_len = r->seq_len;
          }
          break;
        case Reader::IN_QUAL:
          if (c == '\n') {
            // next record (or EOF)
            if (r->in_record && col < row_len) dst[col++] = INVALID;
            r->state = Reader::IN_HEADER;  // '@' header comes next; its
                                           // first char is part of header
            r->in_record = false;
            r->seq_len = 0;
            r->trim_remaining = r->trim_left;
            // skip the '@' of the next header (may hit EOF)
            // handled naturally: IN_HEADER skips until newline
          }
          break;
      }
    }

    if (col == 0) break;  // EOF and nothing emitted

    if (col >= row_len) {
      // Row full: if mid-record, save the (k-1)-code seam for the next row.
      if (r->state == Reader::IN_SEQ && r->in_record) {
        int s = k - 1;
        for (int i = 0; i < s; ++i) r->seam[i] = dst[row_len - s + i];
        r->seam_len = s;
      }
    } else {
      // EOF inside this row: pad.
      for (; col < row_len; ++col) dst[col] = PAD;
    }
    ++row;
    if (r->eof && r->pos >= r->len && r->seam_len == 0) break;
  }
  return row;
}

}  // extern "C"

// Native data-loading kernels for item-alignment-tpu.
//
// The reference's data layer is pure Python (SURVEY.md §2: no native
// components anywhere); at production scale the offline TSV scan
// (finetune_text.load_raw_data re-reads multi-GB TSVs per run) becomes a
// host-side bottleneck.  This library provides:
//
//   - tsv_index:   one-pass mmap scan producing per-field (start, end)
//                  offset tables (zero-copy string slicing in Python)
//   - count_char:  fast delimiter counting
//
// (A pack_rows batch-gather kernel was tried for the batcher's inner
// loop and removed: numpy fancy indexing beat it 2x once ctypes
// marshalling was accounted for.)
//
// Built as a plain shared library; Python binds via ctypes
// (item_alignment_tpu/data/native_loader.py).  No external dependencies.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Mapped {
  const char* data = nullptr;
  size_t size = 0;
  void* raw = nullptr;
  int error = 0;
};

Mapped map_file(const char* path) {
  Mapped m;
  int fd = open(path, O_RDONLY);
  if (fd < 0) { m.error = -1; return m; }
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); m.error = -2; return m; }
  m.size = static_cast<size_t>(st.st_size);
  if (m.size == 0) { close(fd); return m; }
  m.raw = mmap(nullptr, m.size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (m.raw == MAP_FAILED) { m.raw = nullptr; m.error = -3; return m; }
  m.data = static_cast<const char*>(m.raw);
  return m;
}

}  // namespace

extern "C" {

// Two-pass protocol: first call with null output pointers to obtain
// (n_lines, n_fields); allocate; call again to fill
//   field_starts[n_fields], field_ends[n_fields]  (byte offsets)
//   field_counts[n_lines]                          (fields per line)
// Returns 0 on success, negative on failure.
int64_t tsv_index(const char* path, int64_t* n_lines, int64_t* n_fields,
                  int64_t* field_starts, int64_t* field_ends,
                  int64_t* field_counts) {
  Mapped m = map_file(path);
  if (m.error) return m.error;
  int64_t lines = 0, fields = 0;
  size_t pos = 0;
  while (pos < m.size) {
    const char* nl = static_cast<const char*>(
        memchr(m.data + pos, '\n', m.size - pos));
    size_t line_end = nl ? static_cast<size_t>(nl - m.data) : m.size;
    int64_t line_fields = 0;
    size_t field_start = pos;
    while (true) {
      const char* tab = static_cast<const char*>(
          memchr(m.data + field_start, '\t', line_end - field_start));
      size_t field_end = tab ? static_cast<size_t>(tab - m.data) : line_end;
      if (field_starts != nullptr) {
        field_starts[fields] = static_cast<int64_t>(field_start);
        field_ends[fields] = static_cast<int64_t>(field_end);
      }
      ++fields;
      ++line_fields;
      if (!tab) break;
      field_start = field_end + 1;
    }
    if (field_counts != nullptr) field_counts[lines] = line_fields;
    ++lines;
    pos = line_end + 1;
  }
  if (m.raw) munmap(m.raw, m.size);
  *n_lines = lines;
  *n_fields = fields;
  return 0;
}

int64_t count_char(const char* path, char needle) {
  Mapped m = map_file(path);
  if (m.error) return m.error;
  int64_t count = 0;
  const char* p = m.data;
  size_t left = m.size;
  while (left > 0) {
    const char* hit = static_cast<const char*>(memchr(p, needle, left));
    if (!hit) break;
    ++count;
    left -= static_cast<size_t>(hit - p) + 1;
    p = hit + 1;
  }
  if (m.raw) munmap(m.raw, m.size);
  return count;
}

}  // extern "C"

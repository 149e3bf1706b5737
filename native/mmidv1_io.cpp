// Native IO layer: fast CSV parsing + trace writing.
//
// The reference implements its entire data layer in C++
// (src/utils/ReadContactMatrix.cpp, src/utils/GetCalibrationData.cpp) and its
// MCMC trace/checkpoint writers in C++ ofstream loops
// (src/sir_age_structured/optimizers/MetropolisHastingsSampler.cpp:380-469).
// This is the TPU-native framework's equivalent native runtime component:
// the compute path is JAX/XLA/Pallas; host-side bulk IO is C++ behind ctypes
// (see mmidv1_tpu/utils/native.py, which builds this file on demand with g++
// and falls back to pure Python when no toolchain is available).
//
// Exported C ABI:
//   mmidv1_read_csv_matrix   — numeric CSV -> row-major double buffer
//                              ("//"-comment lines skipped, strict dims,
//                              error taxonomy matching ReadContactMatrix.cpp)
//   mmidv1_count_csv         — pre-scan rows/cols of a numeric CSV
//   mmidv1_read_csv_table    — header'd CSV -> selected columns as doubles
//                              (non-numeric cells -> NaN)
//   mmidv1_write_trace_csv   — (n_rows x n_cols) doubles -> "%.8e" CSV with
//                              header + row index (posterior trace format)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// error codes (mirrors the CSVReadException taxonomy,
// include/exceptions/CSVReadException.hpp)
enum ErrorCode : int32_t {
  OK = 0,
  FILE_NOT_OPEN = 1,
  WRONG_ROW_COUNT = 2,
  WRONG_COL_COUNT = 3,
  PARSE_ERROR = 4,
  WRITE_ERROR = 5,
};

bool read_file(const char* path, std::string* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(&(*out)[0], 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

inline const char* next_line(const char* p, const char* end,
                             const char** line_end) {
  const char* nl = static_cast<const char*>(
      memchr(p, '\n', static_cast<size_t>(end - p)));
  if (!nl) {
    *line_end = end;
    return end;
  }
  *line_end = (nl > p && nl[-1] == '\r') ? nl - 1 : nl;
  return nl + 1;
}

inline bool is_blank(const char* b, const char* e) {
  for (; b < e; ++b)
    if (*b != ' ' && *b != '\t') return false;
  return true;
}

inline bool is_comment(const char* b, const char* e) {
  while (b < e && (*b == ' ' || *b == '\t')) ++b;
  return (e - b) >= 2 && b[0] == '/' && b[1] == '/';
}

}  // namespace

extern "C" {

// Parse an R x C numeric CSV into out (row-major, length rows*cols).
// Skips "//" comment lines and blank lines (ReadContactMatrix.cpp:8-83).
// STRICTER than the Python contact_matrix reader by design: extra rows or
// columns are hard errors here (the Python path truncates to R x C, and
// treats interior // lines as parse errors). The strict form is the one
// wired into tests; do not swap it under data/contact_matrix.py without
// relaxing these checks to match.
int32_t mmidv1_read_csv_matrix(const char* path, int64_t rows, int64_t cols,
                               double* out) {
  std::string buf;
  if (!read_file(path, &buf)) return FILE_NOT_OPEN;
  const char* p = buf.data();
  const char* end = p + buf.size();
  int64_t r = 0;
  while (p < end) {
    const char* le;
    const char* nxt = next_line(p, end, &le);
    if (!is_blank(p, le) && !is_comment(p, le)) {
      if (r >= rows) return WRONG_ROW_COUNT;
      int64_t c = 0;
      const char* q = p;
      while (q <= le) {
        const char* cell_end = static_cast<const char*>(
            memchr(q, ',', static_cast<size_t>(le - q)));
        if (!cell_end) cell_end = le;
        if (c >= cols) return WRONG_COL_COUNT;
        char* conv_end = nullptr;
        std::string cell(q, cell_end);
        double v = std::strtod(cell.c_str(), &conv_end);
        if (conv_end == cell.c_str()) return PARSE_ERROR;
        out[r * cols + c] = v;
        ++c;
        if (cell_end == le) break;
        q = cell_end + 1;
      }
      if (c != cols) return WRONG_COL_COUNT;
      ++r;
    }
    p = nxt;
  }
  return r == rows ? OK : WRONG_ROW_COUNT;
}

// Count data rows and columns (from the first non-comment line).
int32_t mmidv1_count_csv(const char* path, int64_t* rows, int64_t* cols) {
  std::string buf;
  if (!read_file(path, &buf)) return FILE_NOT_OPEN;
  const char* p = buf.data();
  const char* end = p + buf.size();
  *rows = 0;
  *cols = 0;
  while (p < end) {
    const char* le;
    const char* nxt = next_line(p, end, &le);
    if (!is_blank(p, le) && !is_comment(p, le)) {
      if (*cols == 0) {
        int64_t c = 1;
        for (const char* q = p; q < le; ++q)
          if (*q == ',') ++c;
        *cols = c;
      }
      ++*rows;
    }
    p = nxt;
  }
  return OK;
}

// Read selected columns of a header'd CSV as doubles (row-major
// n_data_rows x n_sel). col_idx holds 0-based column indices into the
// header row. Non-numeric/empty cells become NaN. Returns OK or an error.
int32_t mmidv1_read_csv_table(const char* path, const int64_t* col_idx,
                              int64_t n_sel, int64_t skip_header,
                              double* out, int64_t max_rows,
                              int64_t* rows_read) {
  std::string buf;
  if (!read_file(path, &buf)) return FILE_NOT_OPEN;
  const char* p = buf.data();
  const char* end = p + buf.size();
  int64_t max_col = 0;
  for (int64_t i = 0; i < n_sel; ++i)
    if (col_idx[i] > max_col) max_col = col_idx[i];

  std::vector<std::pair<const char*, const char*>> cells;
  cells.reserve(static_cast<size_t>(max_col) + 2);
  int64_t r = 0;
  int64_t line_no = 0;
  while (p < end) {
    const char* le;
    const char* nxt = next_line(p, end, &le);
    // skip comment lines too: mmidv1_count_csv excludes them from the row
    // count, and a leading // line would otherwise consume the skip_header
    // budget and shift every data row by one
    if (!is_blank(p, le) && !is_comment(p, le)) {
      if (line_no++ < skip_header) {
        p = nxt;
        continue;
      }
      if (r >= max_rows) return WRONG_ROW_COUNT;
      cells.clear();
      const char* q = p;
      while (q <= le) {
        const char* ce = static_cast<const char*>(
            memchr(q, ',', static_cast<size_t>(le - q)));
        if (!ce) ce = le;
        cells.emplace_back(q, ce);
        if (ce == le) break;
        q = ce + 1;
      }
      for (int64_t i = 0; i < n_sel; ++i) {
        double v = std::nan("");
        int64_t ci = col_idx[i];
        if (ci < static_cast<int64_t>(cells.size())) {
          std::string cell(cells[ci].first, cells[ci].second);
          if (!cell.empty()) {
            char* conv_end = nullptr;
            double parsed = std::strtod(cell.c_str(), &conv_end);
            if (conv_end != cell.c_str()) v = parsed;
          }
        }
        out[r * n_sel + i] = v;
      }
      ++r;
    }
    p = nxt;
  }
  *rows_read = r;
  return OK;
}

// Write a posterior-trace CSV: "sample,<header>\n" then one "%.8e" row per
// sample (MetropolisHastingsSampler.cpp:440-469 format).
int32_t mmidv1_write_trace_csv(const char* path, const char* header,
                               const double* data, int64_t n_rows,
                               int64_t n_cols) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return FILE_NOT_OPEN;
  std::string buf;
  buf.reserve(1 << 20);
  buf.append("sample,");
  buf.append(header);
  buf.push_back('\n');
  char num[40];
  for (int64_t r = 0; r < n_rows; ++r) {
    int n = std::snprintf(num, sizeof num, "%lld", static_cast<long long>(r));
    buf.append(num, static_cast<size_t>(n));
    for (int64_t c = 0; c < n_cols; ++c) {
      n = std::snprintf(num, sizeof num, ",%.8e", data[r * n_cols + c]);
      buf.append(num, static_cast<size_t>(n));
    }
    buf.push_back('\n');
    if (buf.size() > (1 << 20)) {
      if (std::fwrite(buf.data(), 1, buf.size(), f) != buf.size()) {
        std::fclose(f);
        return WRITE_ERROR;
      }
      buf.clear();
    }
  }
  bool ok = std::fwrite(buf.data(), 1, buf.size(), f) == buf.size();
  std::fclose(f);
  return ok ? OK : WRITE_ERROR;
}

}  // extern "C"

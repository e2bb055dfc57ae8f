// Native data-loading path for new_cg_variants_tpu.
//
// The reference's data layer reads MatrixMarket files through
// scipy.io.mmread (numerical_experiments/figure_gen.py:350), and its only
// native-code components are the PETSc C solvers (SURVEY §2.6).  For the
// TPU build the solvers live on-device (JAX/Pallas), so the native layer
// owns what actually runs on host: bulk file parsing and operator packing,
// where Python/NumPy loops dominate startup time for the larger fixtures.
//
// C ABI (loaded via ctypes from new_cg_variants_tpu/matio/_native.py):
//   ncgv_read_coordinate  - parse the entry triplets of a MatrixMarket
//                           coordinate file (0-based output indices)
//   ncgv_pack_ell         - COO -> padded-ELL packing (row-major slots,
//                           entries pre-sorted by (row, col))
//   ncgv_free             - release buffers allocated by the reader
//
// Build: native/Makefile -> build/libncgv_native.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

// Read the whole file into a NUL-terminated heap buffer.
char* slurp(const char* path, size_t* len_out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    std::fseek(f, 0, SEEK_END);
    long len = std::ftell(f);
    if (len < 0) { std::fclose(f); return nullptr; }
    std::fseek(f, 0, SEEK_SET);
    char* buf = static_cast<char*>(std::malloc(static_cast<size_t>(len) + 1));
    if (!buf) { std::fclose(f); return nullptr; }
    size_t rd = std::fread(buf, 1, static_cast<size_t>(len), f);
    std::fclose(f);
    buf[rd] = '\0';
    *len_out = rd;
    return buf;
}

inline void skip_ws(const char*& p) {
    while (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n') ++p;
}

inline void skip_line(const char*& p) {
    while (*p && *p != '\n') ++p;
    if (*p == '\n') ++p;
}

}  // namespace

extern "C" {

// Parse a MatrixMarket coordinate file with numeric values.
// Outputs are malloc'd arrays owned by the caller (free with ncgv_free);
// indices are converted to 0-based.  Returns the number of entries read,
// or -1 on any error (caller falls back to the Python parser).
int64_t ncgv_read_coordinate(const char* path, int64_t** row_out,
                             int64_t** col_out, double** val_out) {
    size_t len = 0;
    char* buf = slurp(path, &len);
    if (!buf) return -1;

    const char* p = buf;
    // header + comment lines
    while (*p == '%') skip_line(p);
    // size line: m n nnz
    char* end = nullptr;
    std::strtoll(p, &end, 10);  // m (unused here; validated by caller)
    if (end == p) { std::free(buf); return -1; }
    p = end;
    std::strtoll(p, &end, 10);  // n
    if (end == p) { std::free(buf); return -1; }
    p = end;
    long long nnz = std::strtoll(p, &end, 10);
    if (end == p || nnz < 0) { std::free(buf); return -1; }
    p = end;

    int64_t* row = static_cast<int64_t*>(std::malloc(sizeof(int64_t) * nnz));
    int64_t* col = static_cast<int64_t*>(std::malloc(sizeof(int64_t) * nnz));
    double* val = static_cast<double*>(std::malloc(sizeof(double) * nnz));
    if (!row || !col || !val) {
        std::free(row); std::free(col); std::free(val); std::free(buf);
        return -1;
    }

    int64_t k = 0;
    for (; k < nnz; ++k) {
        skip_ws(p);
        if (!*p) break;
        long long i = std::strtoll(p, &end, 10);
        if (end == p) break;
        p = end;
        long long j = std::strtoll(p, &end, 10);
        if (end == p) break;
        p = end;
        double v = std::strtod(p, &end);
        if (end == p) break;  // pattern files (no value) -> Python path
        p = end;
        row[k] = i - 1;
        col[k] = j - 1;
        val[k] = v;
    }
    std::free(buf);
    if (k != nnz) {
        std::free(row); std::free(col); std::free(val);
        return -1;
    }
    *row_out = row;
    *col_out = col;
    *val_out = val;
    return k;
}

void ncgv_free(void* p) { std::free(p); }

// COO -> padded ELL.  Entries must be sorted by (row, col); caller
// provides ell_val zero-filled and ell_idx filled with the row index
// (self-referencing padding keeps gathers in-bounds).  Returns 0 on
// success, -1 if any row exceeds L slots.
int32_t ncgv_pack_ell(const int64_t* row, const int64_t* col,
                      const double* val, int64_t nnz, int64_t n, int64_t L,
                      double* ell_val, int32_t* ell_idx) {
    int64_t* slot = static_cast<int64_t*>(std::calloc(n, sizeof(int64_t)));
    if (!slot) return -1;
    for (int64_t e = 0; e < nnz; ++e) {
        int64_t i = row[e];
        if (i < 0 || i >= n || slot[i] >= L) { std::free(slot); return -1; }
        int64_t s = slot[i]++;
        ell_val[i * L + s] += val[e];
        ell_idx[i * L + s] = static_cast<int32_t>(col[e]);
    }
    std::free(slot);
    return 0;
}

}  // extern "C"

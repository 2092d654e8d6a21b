// Native mmap'd .fvecs/.bvecs/.ivecs loader — the bulk-ingest data path.
//
// The reference ingests vectors one row at a time through the SQL insert
// path (embedding.c:556-604); benchmark-scale corpora (SIFT1B/Deep1B
// distribute as *vecs files: every row is [int32 dim][dim elements])
// need a bulk reader that feeds the TPU staging buffers at memory speed.
// This loader mmaps the file once (no read() copies, the page cache is
// the buffer pool) and converts row ranges to contiguous f32 with a
// thread pool — bvecs (u8) and ivecs (i32) upconvert during the copy, so
// Python never touches the raw bytes.
//
// C ABI (ctypes-friendly, mirrors csrc/hnsw_ref.cpp's conventions):
//   vecs_open(path, elem_kind) -> handle   (kind: 0=f32, 1=u8, 2=i32)
//   vecs_rows(handle) / vecs_dims(handle)
//   vecs_read(handle, start, count, out_f32, n_threads) -> rows copied
//   vecs_close(handle)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct VecsFile {
    const uint8_t* base = nullptr;   // mmap base
    size_t file_bytes = 0;
    int64_t rows = 0;
    int32_t dims = 0;
    int elem_kind = 0;               // 0=f32, 1=u8, 2=i32
    size_t elem_size = 4;
    size_t row_bytes = 0;            // 4 (dim header) + dims * elem_size
    int fd = -1;
};

size_t kind_size(int kind) { return kind == 1 ? 1 : 4; }

void convert_rows(const VecsFile* f, int64_t start, int64_t count,
                  float* out) {
    const int32_t d = f->dims;
    for (int64_t r = 0; r < count; ++r) {
        const uint8_t* rec = f->base + (start + r) * f->row_bytes + 4;
        float* dst = out + r * d;
        switch (f->elem_kind) {
            case 0:
                std::memcpy(dst, rec, sizeof(float) * d);
                break;
            case 1: {
                const uint8_t* src = rec;
                for (int32_t i = 0; i < d; ++i) dst[i] = float(src[i]);
                break;
            }
            default: {
                const int32_t* src = reinterpret_cast<const int32_t*>(rec);
                for (int32_t i = 0; i < d; ++i) dst[i] = float(src[i]);
            }
        }
    }
}

}  // namespace

extern "C" {

void vecs_close(void* h);

void* vecs_open(const char* path, int elem_kind) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size < 8) { ::close(fd); return nullptr; }
    void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (base == MAP_FAILED) { ::close(fd); return nullptr; }
    // sequential-scan hint: the kernel readahead does the prefetching
    madvise(base, st.st_size, MADV_SEQUENTIAL);

    auto* f = new VecsFile();
    f->base = static_cast<const uint8_t*>(base);
    f->file_bytes = st.st_size;
    f->fd = fd;
    f->elem_kind = elem_kind;
    f->elem_size = kind_size(elem_kind);
    f->dims = *reinterpret_cast<const int32_t*>(f->base);
    if (f->dims <= 0 || f->dims > (1 << 20)) { vecs_close(f); return nullptr; }
    f->row_bytes = 4 + size_t(f->dims) * f->elem_size;
    if (f->file_bytes % f->row_bytes != 0) { vecs_close(f); return nullptr; }
    f->rows = int64_t(f->file_bytes / f->row_bytes);
    return f;
}

int64_t vecs_rows(void* h) { return static_cast<VecsFile*>(h)->rows; }
int32_t vecs_dims(void* h) { return static_cast<VecsFile*>(h)->dims; }

int64_t vecs_read(void* h, int64_t start, int64_t count, float* out,
                  int n_threads) {
    auto* f = static_cast<VecsFile*>(h);
    if (start < 0 || start >= f->rows) return 0;
    count = std::min(count, f->rows - start);
    if (count <= 0) return 0;
    if (n_threads <= 1 || count < 4096) {
        convert_rows(f, start, count, out);
        return count;
    }
    int nt = std::min<int64_t>(n_threads, (count + 4095) / 4096);
    std::vector<std::thread> pool;
    pool.reserve(nt);
    const int64_t per = (count + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        const int64_t lo = t * per;
        const int64_t hi = std::min(count, lo + per);
        if (lo >= hi) break;
        pool.emplace_back([f, start, lo, hi, out] {
            convert_rows(f, start + lo, hi - lo,
                         out + lo * int64_t(f->dims));
        });
    }
    for (auto& th : pool) th.join();
    return count;
}

void vecs_close(void* h) {
    auto* f = static_cast<VecsFile*>(h);
    if (f->base) munmap(const_cast<uint8_t*>(f->base), f->file_bytes);
    if (f->fd >= 0) ::close(f->fd);
    delete f;
}

}  // extern "C"

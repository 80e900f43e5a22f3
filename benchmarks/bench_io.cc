// Raw native-I/O benchmark: striped batched pwrite throughput.
//
// Drives the tpgsd native I/O core (tpgsd/io/native/tpgsd_io.cpp)
// directly from C++ - the counterpart of the reference's C++ benchmark
// pair which drives its native engine under MPI (reference:
// pgsd/scripts/benchmark-write.cc / benchmark-read.cc).  Measures the
// ceiling the Python file layer can reach on this host.
//
// Build: make -C benchmarks  (or see benchmarks/Makefile)
// Usage: bench_io [file] [total_MiB] [shards] [threads]

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

extern "C" {
struct TioSlice {
    const void* buf;
    unsigned long long len;
    long long off;
};
int tio_pwrite_batch(int fd, const TioSlice* s, long long n, int nt);
int tio_pread_batch(int fd, const TioSlice* s, long long n, int nt);
}

int main(int argc, char** argv) {
    const char* path = argc > 1 ? argv[1] : "bench_io.bin";
    const size_t total = (argc > 2 ? atoll(argv[2]) : 1024) << 20;
    const int shards = argc > 3 ? atoi(argv[3]) : 8;
    const int threads = argc > 4 ? atoi(argv[4]) : 4;

    const size_t shard_bytes = total / shards;
    std::vector<char> data(shard_bytes, 0x5a);
    std::vector<TioSlice> slices(shards);
    for (int i = 0; i < shards; ++i) {
        slices[i].buf = data.data();
        slices[i].len = shard_bytes;
        slices[i].off = static_cast<long long>(i) * shard_bytes;
    }

    int fd = open(path, O_RDWR | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) { perror("open"); return 1; }

    auto t0 = std::chrono::steady_clock::now();
    int rc = tio_pwrite_batch(fd, slices.data(), shards, threads);
    auto dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    if (rc != 0) { fprintf(stderr, "write rc=%d\n", rc); return 1; }
    printf("write: %zu MiB, %d shards, %d threads: %.2f s = %.1f MB/s\n",
           total >> 20, shards, threads, dt, total / 1e6 / dt);

    std::vector<char> rd(shard_bytes);
    for (int i = 0; i < shards; ++i) slices[i].buf = rd.data();
    t0 = std::chrono::steady_clock::now();
    rc = tio_pread_batch(fd, slices.data(), shards, 1);
    dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    if (rc != 0) { fprintf(stderr, "read rc=%d\n", rc); return 1; }
    printf("read:  %zu MiB: %.2f s = %.1f MB/s\n", total >> 20, dt,
           total / 1e6 / dt);

    close(fd);
    unlink(path);
    return 0;
}

/* Multi-process MPI stub over named pipes, enough for metacache_mpi.
 * Ranks are separate processes launched with MC_STUB_RANK / MC_STUB_SIZE /
 * MC_STUB_DIR env vars (see run_mpi_stub.sh). In-order delivery per
 * (src,dst) pair; tags are checked. */
#ifndef MPI_STUB2_H
#define MPI_STUB2_H
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <string>
#include <vector>
#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef struct { int MPI_SOURCE, MPI_TAG, MPI_ERROR; } MPI_Status;
#define MPI_COMM_WORLD 0
#define MPI_UINT32_T 1
#define MPI_UNSIGNED 2
#define MPI_INT 3
#define MPI_SUCCESS 0

namespace mpistub {
inline int& rank_() { static int r = 0; return r; }
inline int& size_() { static int s = 1; return s; }
inline std::string& dir_() { static std::string d; return d; }
inline std::vector<int>& rfd_() { static std::vector<int> v; return v; }
inline std::vector<int>& wfd_() { static std::vector<int> v; return v; }

inline std::string fifo_name(int from, int to) {
    return dir_() + "/fifo_" + std::to_string(from) + "_" + std::to_string(to);
}
inline size_t dsize(MPI_Datatype) { return 4; }

inline void die(const char* msg) {
    std::fprintf(stderr, "[mpi_stub rank %d] %s\n", rank_(), msg);
    std::abort();
}

inline void readn(int fd, void* buf, size_t n) {
    char* p = (char*)buf;
    while (n) {
        ssize_t k = ::read(fd, p, n);
        if (k < 0) { if (errno == EINTR || errno == EAGAIN) { usleep(100); continue; } die("read"); }
        if (k == 0) { usleep(100); continue; }
        p += k; n -= (size_t)k;
    }
}
inline void writen(int fd, const void* buf, size_t n) {
    const char* p = (const char*)buf;
    while (n) {
        ssize_t k = ::write(fd, p, n);
        if (k < 0) { if (errno == EINTR || errno == EAGAIN) { usleep(100); continue; } die("write"); }
        p += k; n -= (size_t)k;
    }
}

inline void send_msg(int dst, int tag, const void* buf, size_t bytes) {
    int32_t hdr[2] = {(int32_t)tag, (int32_t)bytes};
    writen(wfd_()[dst], hdr, sizeof hdr);
    writen(wfd_()[dst], buf, bytes);
}
inline void recv_msg(int src, int tag, void* buf, size_t bytes, MPI_Status* st) {
    int32_t hdr[2];
    readn(rfd_()[src], hdr, sizeof hdr);
    if (hdr[0] != tag && tag != -1) die("tag mismatch");
    if ((size_t)hdr[1] > bytes) die("message larger than recv buffer");
    readn(rfd_()[src], buf, (size_t)hdr[1]);
    if (st) { st->MPI_SOURCE = src; st->MPI_TAG = hdr[0]; st->MPI_ERROR = 0; }
}
} // namespace mpistub

inline int MPI_Init(int*, char***) {
    using namespace mpistub;
    const char* r = getenv("MC_STUB_RANK");
    const char* s = getenv("MC_STUB_SIZE");
    const char* d = getenv("MC_STUB_DIR");
    rank_() = r ? atoi(r) : 0;
    size_() = s ? atoi(s) : 1;
    dir_() = d ? d : "/tmp/mpistub";
    if (size_() == 1) return 0;
    ::mkdir(dir_().c_str(), 0777);
    rfd_().assign(size_(), -1);
    wfd_().assign(size_(), -1);
    for (int p = 0; p < size_(); ++p) {
        if (p == rank_()) continue;
        ::mkfifo(fifo_name(p, rank_()).c_str(), 0666);
        ::mkfifo(fifo_name(rank_(), p).c_str(), 0666);
    }
    // open read ends non-blocking first, then write ends with retry
    for (int p = 0; p < size_(); ++p) {
        if (p == rank_()) continue;
        int fd = -1;
        while ((fd = ::open(fifo_name(p, rank_()).c_str(),
                            O_RDONLY | O_NONBLOCK)) < 0) usleep(1000);
        rfd_()[p] = fd;
    }
    for (int p = 0; p < size_(); ++p) {
        if (p == rank_()) continue;
        int fd = -1;
        while ((fd = ::open(fifo_name(rank_(), p).c_str(), O_WRONLY)) < 0)
            usleep(1000);
        wfd_()[p] = fd;
#ifdef F_SETPIPE_SZ
        fcntl(fd, F_SETPIPE_SZ, 1 << 20);
#endif
    }
    // make reads blocking again
    for (int p = 0; p < size_(); ++p) {
        if (p == rank_()) continue;
        int fl = fcntl(rfd_()[p], F_GETFL);
        fcntl(rfd_()[p], F_SETFL, fl & ~O_NONBLOCK);
    }
    return 0;
}
inline int MPI_Finalize() { return 0; }
inline int MPI_Comm_rank(MPI_Comm, int* r) { *r = mpistub::rank_(); return 0; }
inline int MPI_Comm_size(MPI_Comm, int* s) { *s = mpistub::size_(); return 0; }

inline int MPI_Send(const void* buf, int count, MPI_Datatype dt, int dst,
                    int tag, MPI_Comm) {
    mpistub::send_msg(dst, tag, buf, (size_t)count * mpistub::dsize(dt));
    return 0;
}
inline int MPI_Recv(void* buf, int count, MPI_Datatype dt, int src, int tag,
                    MPI_Comm, MPI_Status* st) {
    mpistub::recv_msg(src, tag, buf, (size_t)count * mpistub::dsize(dt), st);
    return 0;
}
inline int MPI_Barrier(MPI_Comm) {
    using namespace mpistub;
    if (size_() == 1) return 0;
    const int TAG = 0x7FFF0000;
    char tok = 1;
    if (rank_() == 0) {
        for (int p = 1; p < size_(); ++p) recv_msg(p, TAG, &tok, 1, nullptr);
        for (int p = 1; p < size_(); ++p) send_msg(p, TAG, &tok, 1);
    } else {
        send_msg(0, TAG, &tok, 1);
        recv_msg(0, TAG, &tok, 1, nullptr);
    }
    return 0;
}
inline int MPI_Bcast(void* buf, int count, MPI_Datatype dt, int root,
                     MPI_Comm) {
    using namespace mpistub;
    if (size_() == 1) return 0;
    const int TAG = 0x7FFF0001;
    if (rank_() == root) {
        for (int p = 0; p < size_(); ++p)
            if (p != root) send_msg(p, TAG, buf, (size_t)count * dsize(dt));
    } else {
        recv_msg(root, TAG, buf, (size_t)count * dsize(dt), nullptr);
    }
    return 0;
}
inline int MPI_Gather(const void* sb, int sc, MPI_Datatype sdt, void* rb,
                      int rc, MPI_Datatype rdt, int root, MPI_Comm) {
    using namespace mpistub;
    const int TAG = 0x7FFF0002;
    size_t bytes = (size_t)sc * dsize(sdt);
    if (size_() == 1) { std::memcpy(rb, sb, bytes); return 0; }
    if (rank_() == root) {
        for (int p = 0; p < size_(); ++p) {
            char* dst = (char*)rb + (size_t)p * bytes;
            if (p == root) std::memcpy(dst, sb, bytes);
            else recv_msg(p, TAG, dst, bytes, nullptr);
        }
    } else {
        send_msg(root, TAG, sb, bytes);
    }
    return 0;
}
#endif

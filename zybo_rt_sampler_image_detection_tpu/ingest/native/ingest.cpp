// Native UDP ingest engine for the TPU-VM host.
//
// TPU-native replacement for the reference's fork()'d C receiver child +
// SysV shared-memory ring + semaphores (PC/src/api.c:679-939,
// PC/src/receiver.c): one receive thread parses protocol-v2 datagrams,
// un-serpentines and normalizes into a double-buffered latest-frame slot
// guarded by a seqlock, and keeps packet-counter gap statistics (the
// header counter the reference never used, receiver.h:56).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// The hot loop does one recv() + a 256-entry permuted scatter per packet;
// at 190.7 frames/s that is ~48.8k packets/s, far below what a single
// thread sustains here.

#include <arpa/inet.h>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <netinet/in.h>
#include <string>
#include <sys/socket.h>
#include <sys/time.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Engine {
    // config
    int n_mics = 256;       // stream slots per packet
    int n_samples = 256;
    int rows = 8, cols = 8;
    double norm = 16777216.0;
    int protocol_ver = 2;
    int exact_serpentine = 1;

    // runtime
    int sock = -1;
    int n_arrays = 0;
    std::vector<int> perm;          // logical mic -> stream index
    std::vector<float> buf[2];      // double buffer (n_mics * n_samples)
    std::atomic<long long> seq{0};  // completed-frame sequence
    std::mutex mu;
    std::condition_variable cv;
    std::thread thr;
    std::atomic<bool> stop{false};

    // stats
    std::atomic<long long> packets{0}, frames{0}, gaps{0}, bad_proto{0};
    long long last_counter = -1;
};

Engine g;

#pragma pack(push, 1)
struct MsgHeader {
    uint16_t frequency;
    int8_t n_arrays;
    int8_t protocol_ver;
    uint32_t counter;
};
#pragma pack(pop)

void build_perm() {
    int n_ch = g.n_arrays * g.rows * g.cols;
    g.perm.resize(n_ch);
    int s = 0;
    for (int n = 0; n < g.n_arrays; n++) {
        for (int y = 0; y < g.rows; y++) {
            int row = n * g.rows * g.cols + y * g.cols;
            for (int x = 0; x < g.cols; x++) {
                int idx;
                if (y % 2 == 0) idx = row + x;
                else if (g.exact_serpentine) idx = row + g.cols - x;
                else idx = row + g.cols - 1 - x;
                if (idx > g.n_mics - 1) idx = g.n_mics - 1;
                g.perm[s++] = idx;
            }
        }
    }
}

void recv_loop() {
    const int n_ch = (int)g.perm.size();
    const size_t psize = sizeof(MsgHeader) + 4ull * g.n_mics;
    std::vector<uint8_t> pkt(psize);
    std::vector<float> frame((size_t)g.n_mics * g.n_samples, 0.0f);
    const double inv_norm = 1.0 / g.norm;

    while (!g.stop.load(std::memory_order_relaxed)) {
        ssize_t n = recv(g.sock, pkt.data(), psize, 0);
        if (n < 0) continue;               // timeout (SO_RCVTIMEO) or EINTR
        if ((size_t)n < psize) continue;
        const MsgHeader* h = (const MsgHeader*)pkt.data();
        if (h->protocol_ver != g.protocol_ver) { g.bad_proto++; continue; }
        if (g.last_counter >= 0) {
            long long gap =
                ((long long)h->counter - g.last_counter - 1) & 0xFFFFFFFFll;
            if (gap > 0 && gap < (1 << 16)) g.gaps += gap;
        }
        g.last_counter = h->counter;
        g.packets++;

        // Frame slot from the packet counter (unused by the reference):
        // keeps assembly aligned across startup offsets and packet loss.
        const int step = (int)(h->counter % (uint32_t)g.n_samples);
        const int32_t* stream = (const int32_t*)(pkt.data() + sizeof(MsgHeader));
        for (int s = 0; s < n_ch; s++) {
            frame[(size_t)s * g.n_samples + step] =
                (float)((double)stream[g.perm[s]] * inv_norm);
        }
        if (step == g.n_samples - 1) {
            long long sq = g.seq.load(std::memory_order_relaxed);
            std::memcpy(g.buf[(sq + 1) % 2].data(), frame.data(),
                        frame.size() * sizeof(float));
            {
                std::lock_guard<std::mutex> lk(g.mu);
                g.seq.store(sq + 1, std::memory_order_release);
            }
            g.cv.notify_all();
            g.frames++;
            // Zero the assembly buffer so packets lost in any later frame
            // leave zeros (the documented contract), not stale samples.
            std::memset(frame.data(), 0, frame.size() * sizeof(float));
        }
    }
}

}  // namespace

extern "C" {

// Returns n_arrays on success; -1 socket error, -2 bind error,
// -3 header timeout, -4 protocol mismatch.
int zrt_ingest_connect(const char* ip, int port, int n_mics, int n_samples,
                       int rows, int cols, double norm, int protocol_ver,
                       int exact_serpentine, double header_timeout_s) {
    g.n_mics = n_mics; g.n_samples = n_samples; g.rows = rows; g.cols = cols;
    g.norm = norm; g.protocol_ver = protocol_ver;
    g.exact_serpentine = exact_serpentine;
    g.stop.store(false);
    g.packets = 0; g.frames = 0; g.gaps = 0; g.bad_proto = 0;
    g.last_counter = -1; g.seq = 0;

    g.sock = socket(AF_INET, SOCK_DGRAM, IPPROTO_UDP);
    if (g.sock < 0) return -1;
    int rcvbuf = 1 << 22;
    setsockopt(g.sock, SOL_SOCKET, SO_RCVBUF, &rcvbuf, sizeof(rcvbuf));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons((uint16_t)port);
    addr.sin_addr.s_addr = inet_addr(ip);
    if (bind(g.sock, (sockaddr*)&addr, sizeof(addr)) < 0) {
        close(g.sock); g.sock = -1; return -2;
    }

    // Header packet: n_arrays + protocol check (receiver.c:224-239).
    timeval tv{};
    tv.tv_sec = (long)header_timeout_s;
    tv.tv_usec = (long)((header_timeout_s - tv.tv_sec) * 1e6);
    setsockopt(g.sock, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    std::vector<uint8_t> pkt(sizeof(MsgHeader) + 4ull * n_mics);
    ssize_t n = recv(g.sock, pkt.data(), pkt.size(), 0);
    if (n < (ssize_t)sizeof(MsgHeader)) { close(g.sock); g.sock = -1; return -3; }
    const MsgHeader* h = (const MsgHeader*)pkt.data();
    if (h->protocol_ver != protocol_ver) { close(g.sock); g.sock = -1; return -4; }
    g.n_arrays = h->n_arrays;
    g.last_counter = h->counter;

    build_perm();
    g.buf[0].assign((size_t)n_mics * n_samples, 0.0f);
    g.buf[1].assign((size_t)n_mics * n_samples, 0.0f);

    timeval tv2{0, 200000};  // 200 ms poll so stop() is responsive
    setsockopt(g.sock, SOL_SOCKET, SO_RCVTIMEO, &tv2, sizeof(tv2));
    g.thr = std::thread(recv_loop);
    return g.n_arrays;
}

// Copy the newest complete frame into out (n_mics * n_samples floats).
// fresh!=0 waits for a frame with seq > last_seq (timeout_ms).
// Returns the frame sequence, or -1 on timeout.
long long zrt_ingest_read(float* out, int fresh, long long last_seq,
                          int timeout_ms) {
    std::unique_lock<std::mutex> lk(g.mu);
    if (fresh) {
        bool ok = g.cv.wait_for(lk, std::chrono::milliseconds(timeout_ms),
                                [&] { return g.seq.load() > last_seq; });
        if (!ok) return -1;
    }
    long long sq = g.seq.load(std::memory_order_acquire);
    std::memcpy(out, g.buf[sq % 2].data(),
                g.buf[sq % 2].size() * sizeof(float));
    return sq;
}

void zrt_ingest_stats(long long* packets, long long* frames, long long* gaps,
                      long long* bad_proto) {
    *packets = g.packets.load(); *frames = g.frames.load();
    *gaps = g.gaps.load(); *bad_proto = g.bad_proto.load();
}

void zrt_ingest_disconnect() {
    g.stop.store(true);
    if (g.thr.joinable()) g.thr.join();
    if (g.sock >= 0) { close(g.sock); g.sock = -1; }
}

}  // extern "C"

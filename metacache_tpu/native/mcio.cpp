// Native batched sequence reader + 2-bit encoder for metacache-tpu.
//
// The TPU-native counterpart of the reference's C++ sequence readers
// (src/sequence_io.cpp:100-324: fasta_reader/fastq_reader) and of the
// host half of the read pipeline: parse FASTA/FASTQ (plain or gzip),
// encode bases to 2-bit codes, and pack directly into the device batch
// layout used by metacache_tpu.ops.encode.np_pack_codes:
//
//   packed[B, L/4]  uint8, 4 bases/byte, little-ordered
//                   (c0 | c1<<2 | c2<<4 | c3<<6)
//   ambig [B, L/8]  uint8 bitplane, bit i of byte j = position 8j+i is
//                   ambiguous (non-ACGT, or padding past the read length)
//   lens  [B]       int32 number of encoded chars (<= Lmax)
//
// Exposed as a plain C ABI consumed through ctypes
// (metacache_tpu/native/__init__.py). The Python readers in
// io/sequence_io.py remain the reference semantics + fallback path; this
// file must behave identically for well-formed inputs:
//   - format sniffing: extension hints, then first non-blank char
//     ('>' fasta / '@' fastq) (src/sequence_io.cpp:527-560)
//   - fasta: multi-line sequence data concatenated until next '>'
//   - fastq: strict 4-line records, '+' quality header required
//   - pairing mode "sequences": consecutive records of one file are mates
//     (src/sequence_io.cpp:397-520); mode "files" is handled by the caller
//     driving two handles in lock-step.
//
// Build: g++ -O3 -shared -fPIC mcio.cpp -o libmcio.so -lz -lpthread
#include <zlib.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// char -> 2-bit code; 255 = ambiguous. Mirrors ops/encode.py _LUT.
struct Lut {
    uint8_t v[256];
    Lut() {
        memset(v, 255, sizeof(v));
        v['A'] = v['a'] = 0;
        v['C'] = v['c'] = 1;
        v['G'] = v['g'] = 2;
        v['T'] = v['t'] = 3;
    }
};
const Lut kLut;

class LineReader {
    // gzFile transparently reads plain files too.
    gzFile f_ = nullptr;
    std::vector<char> buf_;
    size_t pos_ = 0, end_ = 0;
    bool eof_ = false;

  public:
    bool open(const char* path) {
        f_ = gzopen(path, "rb");
        if (!f_) return false;
        gzbuffer(f_, 1 << 20);
        buf_.resize(1 << 20);
        return true;
    }
    ~LineReader() {
        if (f_) gzclose(f_);
    }
    // Appends the next line (without trailing \n / \r) to `out`.
    // Returns false at EOF when no characters were read.
    bool getline(std::string& out) {
        out.clear();
        bool any = false;
        for (;;) {
            if (pos_ >= end_) {
                if (eof_) break;
                int n = gzread(f_, buf_.data(), (unsigned)buf_.size());
                if (n <= 0) {
                    eof_ = true;
                    break;
                }
                pos_ = 0;
                end_ = (size_t)n;
            }
            char* nl = (char*)memchr(buf_.data() + pos_, '\n', end_ - pos_);
            size_t take = nl ? (size_t)(nl - (buf_.data() + pos_))
                             : end_ - pos_;
            out.append(buf_.data() + pos_, take);
            pos_ += take;
            any = any || take > 0;
            if (nl) {
                ++pos_;  // skip '\n'
                any = true;
                break;
            }
        }
        while (!out.empty() && out.back() == '\r') out.pop_back();
        return any || !out.empty();
    }
};

struct Record {
    std::string header;
    std::string data;
    int32_t index = 0;  // 1-based within its file
};

class SeqReader {
    LineReader lr_;
    bool fastq_ = false;
    bool started_ = false;
    std::string pending_header_;  // fasta: header of the next record
    std::string line_;
    int32_t count_ = 0;
    std::string error_;

  public:
    const char* error() const { return error_.empty() ? nullptr : error_.c_str(); }

    bool open(const char* path) {
        std::string p(path);
        std::string low(p);
        for (auto& c : low) c = (char)tolower(c);
        auto ends = [&](const char* s) {
            size_t n = strlen(s);
            return low.size() >= n && low.compare(low.size() - n, n, s) == 0;
        };
        if (ends(".gz")) low.resize(low.size() - 3);
        bool known = false;
        if (ends(".fa") || ends(".fasta") || ends(".fna") || ends(".ffn") ||
            ends(".faa") || ends(".frn")) {
            fastq_ = false;
            known = true;
        } else if (ends(".fq") || ends(".fastq")) {
            fastq_ = true;
            known = true;
        }
        if (!lr_.open(path)) {
            error_ = "can't open file";
            return false;
        }
        if (!known) {
            // content sniff: first non-blank char
            for (;;) {
                if (!lr_.getline(line_)) {
                    error_ = "file format not recognized";
                    return false;
                }
                size_t i = line_.find_first_not_of(" \t");
                if (i == std::string::npos) continue;
                if (line_[i] == '>') {
                    fastq_ = false;
                } else if (line_[i] == '@') {
                    fastq_ = true;
                } else {
                    error_ = "file format not recognized";
                    return false;
                }
                // hand the sniffed line to next():
                pending_header_ = line_.substr(i + 1);
                started_ = true;
                break;
            }
        }
        return true;
    }

    // Returns: 1 = record produced, 0 = eof, -1 = format error.
    int next(Record& rec) {
        rec.header.clear();
        rec.data.clear();
        if (fastq_) return next_fastq(rec);
        return next_fasta(rec);
    }

  private:
    int next_fasta(Record& rec) {
        if (!started_) {
            // find the first header line
            for (;;) {
                if (!lr_.getline(line_)) return 0;
                if (!line_.empty() && line_[0] == '>') {
                    pending_header_ = line_.substr(1);
                    started_ = true;
                    break;
                }
                if (!line_.empty()) {
                    error_ =
                        "malformed fasta file - expected header char > "
                        "not found";
                    return -1;
                }
            }
        }
        if (pending_header_.empty() && count_ > 0) {
            // EOF was reached previously
        }
        rec.header = pending_header_;
        pending_header_.clear();
        bool have_next = false;
        while (lr_.getline(line_)) {
            if (!line_.empty() && line_[0] == '>') {
                pending_header_ = line_.substr(1);
                have_next = true;
                break;
            }
            rec.data += line_;
        }
        if (rec.header.empty() && rec.data.empty() && !have_next) return 0;
        rec.index = ++count_;
        if (!have_next) started_ = false;  // next call: EOF (no pending)
        else started_ = true;
        return 1;
    }

    int next_fastq(Record& rec) {
        std::string h;
        if (started_ && !pending_header_.empty()) {
            h = "@" + pending_header_;  // from sniffing
            pending_header_.clear();
        } else {
            if (!lr_.getline(h)) return 0;
            if (h.empty()) return 0;
        }
        if (h[0] != '@') {
            error_ = "malformed fastq file - sequence header: " + h;
            return -1;
        }
        rec.header = h.substr(1);
        if (!lr_.getline(rec.data)) rec.data.clear();
        std::string plus, qual;
        if (!lr_.getline(plus)) plus.clear();
        if (plus.empty() || plus[0] != '+') {
            error_ = "malformed fastq file - quality header: " + plus;
            return -1;
        }
        lr_.getline(qual);
        rec.index = ++count_;
        return 1;
    }
};

struct Handle {
    SeqReader r1;
    SeqReader r2;
    bool paired_files = false;
    bool paired_sequences = false;
    std::string error;
};

// Encode rec.data[0:Lmax] into one packed row + ambig row and set len.
// Rows must be zeroed by the caller; padding positions get ambig bits set
// (matching encode_read_into + np_pack_codes: padding code 255).
void encode_row(const std::string& data, int Lmax, uint8_t* packed,
                uint8_t* ambig, int32_t* len) {
    int n = (int)data.size();
    if (n > Lmax) n = Lmax;
    *len = n;
    for (int i = 0; i < n; ++i) {
        uint8_t c = kLut.v[(uint8_t)data[i]];
        if (c == 255) {
            ambig[i >> 3] |= (uint8_t)(1u << (i & 7));
        } else {
            packed[i >> 2] |= (uint8_t)(c << ((i & 3) << 1));
        }
    }
    for (int i = n; i < Lmax; ++i)
        ambig[i >> 3] |= (uint8_t)(1u << (i & 7));
}

}  // namespace

extern "C" {

// pairing: 0 = none, 1 = files (path2 != null), 2 = sequences
void* mcio_open(const char* path1, const char* path2, int pairing) {
    Handle* h = new Handle();
    h->paired_files = pairing == 1;
    h->paired_sequences = pairing == 2;
    if (!h->r1.open(path1)) {
        delete h;
        return nullptr;
    }
    if (h->paired_files) {
        if (!path2 || !h->r2.open(path2)) {
            delete h;
            return nullptr;
        }
    }
    return h;
}

// Read up to B records (pairs in paired modes) into batch buffers.
//   packed1 [B, Lmax/4], ambig1 [B, Lmax/8], lens1 [B]   (zeroed by caller)
//   packed2/ambig2/lens2: mate buffers (may receive len 0 when unpaired)
//   headers: concatenated header bytes; hdr_off[B+1] prefix offsets
//   indices [B]: 1-based record index of read 1 within its file
// Returns number of records read (>= 0), or -1 on format error
// (mcio_error() returns the message).
int64_t mcio_next_batch(void* vh, int64_t B, int64_t Lmax, uint8_t* packed1,
                        uint8_t* ambig1, int32_t* lens1, uint8_t* packed2,
                        uint8_t* ambig2, int32_t* lens2, char* headers,
                        int64_t headers_cap, int64_t* hdr_off,
                        int32_t* indices) {
    Handle* h = (Handle*)vh;
    const int64_t p4 = Lmax / 4, p8 = Lmax / 8;
    Record rec1, rec2;
    int64_t n = 0;
    int64_t hpos = 0;
    hdr_off[0] = 0;
    while (n < B) {
        int s = h->r1.next(rec1);
        if (s < 0) {
            h->error = h->r1.error() ? h->r1.error() : "read error";
            return -1;
        }
        if (s == 0) break;
        bool have2 = false;
        if (h->paired_files) {
            int s2 = h->r2.next(rec2);
            if (s2 < 0) {
                h->error = h->r2.error() ? h->r2.error() : "read error";
                return -1;
            }
            have2 = s2 == 1;
        } else if (h->paired_sequences) {
            int s2 = h->r1.next(rec2);
            if (s2 < 0) {
                h->error = h->r1.error() ? h->r1.error() : "read error";
                return -1;
            }
            have2 = s2 == 1;
        }
        // skip fully empty records (header or data missing), like
        // QueryProcessor._process_one does (r1.empty -> continue)
        if (rec1.header.empty() || rec1.data.empty()) {
            if (!h->paired_files && !h->paired_sequences) continue;
            if (!have2 || rec2.header.empty() || rec2.data.empty()) continue;
            // mate 1 empty but mate 2 present: mirror python behavior
            // (r1.empty -> pair skipped)
            continue;
        }
        encode_row(rec1.data, (int)Lmax, packed1 + n * p4, ambig1 + n * p8,
                   lens1 + n);
        if (have2 && !rec2.data.empty()) {
            encode_row(rec2.data, (int)Lmax, packed2 + n * p4,
                       ambig2 + n * p8, lens2 + n);
        } else {
            lens2[n] = 0;
        }
        int64_t hl = (int64_t)rec1.header.size();
        if (hpos + hl > headers_cap) {
            h->error = "header buffer overflow";
            return -1;
        }
        memcpy(headers + hpos, rec1.header.data(), (size_t)hl);
        hpos += hl;
        hdr_off[n + 1] = hpos;
        indices[n] = rec1.index;
        ++n;
    }
    return n;
}

// Per-read mapping lines for the default output path (the reference
// prints from its worker threads, src/querying.h:1088-1136; here one
// native pass builds the whole window's output buffer): for read i with
// taxon-string index sidx[i] >= 0 writes
// "[qid<col>]<header-first-token><col><taxstr>\n"; sidx[i] < 0 skips the
// read (mapped-only). Returns bytes written or -1 when `cap` is too
// small (caller retries with a larger buffer).
int64_t mcio_format_lines(const char* hdr, const int64_t* hoff, int64_t n,
                          const int64_t* sidx, const char* strs,
                          const int64_t* soff, const char* col,
                          int64_t col_len, const int32_t* qids,
                          char* out, int64_t cap) {
    int64_t p = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t si = sidx[i];
        if (si < 0) continue;
        const char* hstart = hdr + hoff[i];
        int64_t hlen = hoff[i + 1] - hoff[i];
        const char* sp =
            (const char*)memchr(hstart, ' ', (size_t)hlen);
        int64_t tok = sp ? (int64_t)(sp - hstart) : hlen;
        int64_t slen = soff[si + 1] - soff[si];
        if (p + tok + 2 * col_len + slen + 32 > cap) return -1;
        if (qids) {
            p += snprintf(out + p, 24, "%d", qids[i]);
            memcpy(out + p, col, (size_t)col_len);
            p += col_len;
        }
        memcpy(out + p, hstart, (size_t)tok);
        p += tok;
        memcpy(out + p, col, (size_t)col_len);
        p += col_len;
        memcpy(out + p, strs + soff[si], (size_t)slen);
        p += slen;
        out[p++] = '\n';
    }
    return p;
}

const char* mcio_error(void* vh) {
    Handle* h = (Handle*)vh;
    return h->error.c_str();
}

void mcio_close(void* vh) { delete (Handle*)vh; }

}  // extern "C"

namespace {

// ---------------------------------------------------------------------------
// Native build sketcher: the host hot loop of database construction
// (reference: add_all_window_sketches, src/sketch_database.h:1079-1097 +
// the min-hasher, src/hash_dna.h:115-152). Behavior is bit-identical to
// metacache_tpu.ops.sketch.sketch_windows (tested by
// tests/test_native_sketch.py): for every window (length `win`, stride
// `stride`, tail window included, src/dna_encoding.h:261-276) keep the s
// smallest UNIQUE thomas-mueller hashes of the window's canonical kmers,
// emitted in ascending order; 0xFFFFFFFF never enters a sketch.
//
// The device bulk-sketch path (db/build.py WindowBatcher over
// ops/sketch.sketch_windows) is the TPU-native equivalent; this host path
// exists because shipping whole genomes through a tunneled (remote) device
// costs more than sketching them on the host.

int64_t num_windows_of(int64_t L, int64_t win, int64_t stride) {
    if (L <= win) return 1;
    int64_t n_full = (L - win) / stride + 1;
    return n_full + (n_full * stride < L ? 1 : 0);
}

inline uint32_t thomas_mueller(uint32_t x) {
    x = ((x >> 16) ^ x) * 0x45D9F3Bu;
    x = ((x >> 16) ^ x) * 0x45D9F3Bu;
    x = (x >> 16) ^ x;
    return x;
}

// Sketch one sequence; append (feature, window) pairs.
// codes: scratch reused across calls. Returns number of windows.
int64_t sketch_one(const uint8_t* data, int64_t L, int k, int s, int win,
                   int stride, std::vector<uint8_t>& codes,
                   std::vector<uint32_t>& hashes,
                   std::vector<uint32_t>& out_feat,
                   std::vector<int32_t>& out_win) {
    codes.resize((size_t)L);
    for (int64_t i = 0; i < L; ++i) codes[(size_t)i] = kLut.v[data[i]];

    // canonical kmer hash at every start position (or ~0 when the kmer
    // spans an ambiguous char); one rolling pass over the sequence
    int64_t n_kmer = L - k + 1;
    hashes.assign(n_kmer > 0 ? (size_t)n_kmer : 0, 0xFFFFFFFFu);
    if (n_kmer > 0) {
        const uint32_t mask = (k == 16) ? 0xFFFFFFFFu
                                        : ((1u << (2 * k)) - 1u);
        const int rc_shift = 2 * (k - 1);
        uint32_t kmer = 0, rc = 0;
        int since = 0;
        for (int64_t i = 0; i < L; ++i) {
            uint8_t c = codes[(size_t)i];
            if (c > 3) {
                since = 0;
                continue;
            }
            ++since;
            kmer = ((kmer << 2) | c) & mask;
            rc = (rc >> 2) | ((uint32_t)(3 - c) << rc_shift);
            if (since >= k) {
                uint32_t canon = kmer < rc ? kmer : rc;
                hashes[(size_t)(i - k + 1)] = thomas_mueller(canon);
            }
        }
    }

    int64_t nw = num_windows_of(L, win, stride);
    uint32_t buf[64];  // s <= 64 (sketch sizes are small; python guards)
    for (int64_t w = 0; w < nw; ++w) {
        int64_t ws = w * stride;
        int64_t we = ws + win < L ? ws + win : L;
        int64_t ke = we - k + 1;  // kmer starts in [ws, ke)
        int cnt = 0;
        for (int64_t p = ws; p < ke; ++p) {
            uint32_t h = hashes[(size_t)p];
            if (h == 0xFFFFFFFFu) continue;
            if (cnt == s && h >= buf[cnt - 1]) continue;
            // sorted insert, skipping duplicates (hash_dna.h:126-149)
            int lo = 0, hi = cnt;
            while (lo < hi) {
                int mid = (lo + hi) >> 1;
                if (buf[mid] < h) lo = mid + 1; else hi = mid;
            }
            if (lo < cnt && buf[lo] == h) continue;
            int end = cnt < s ? cnt : s - 1;
            for (int j = end; j > lo; --j) buf[j] = buf[j - 1];
            buf[lo] = h;
            if (cnt < s) ++cnt;
        }
        for (int j = 0; j < cnt; ++j) {
            out_feat.push_back(buf[j]);
            out_win.push_back((int32_t)w);
        }
    }
    return nw;
}

struct SketchResult {
    std::vector<std::string> headers;
    std::vector<int64_t> seq_lens;
    std::vector<int32_t> seq_windows;        // windows per record
    // per record; deque: growing the outer container must not invalidate
    // references held by in-flight sketch workers (streaming pipeline)
    std::deque<std::vector<uint32_t>> feat;
    std::deque<std::vector<int32_t>> wins;
    int64_t n_triples = 0;
    std::string error;
};

}  // namespace

extern "C" {

int64_t mcio_num_windows(int64_t L, int64_t win, int64_t stride) {
    return num_windows_of(L, win, stride);
}

// Parse a FASTA/FASTQ file AND sketch the shard-owned records in one pass.
// Record i gets target id t0+i; it is sketched iff
// (t0+i) % num_shards == shard_id (add_target_distributed,
// src/sketch_database.h:519-563); headers/lengths return for ALL records.
// Returns a result handle (query with mcio_sk_*, free with mcio_sk_free)
// or nullptr if the file can't be opened.
void* mcio_sketch_file(const char* path, int k, int s, int win, int stride,
                       int64_t t0, int64_t num_shards, int64_t shard_id,
                       int nthreads) {
    if (s > 64 || k < 1 || k > 16) return nullptr;
    SeqReader rd;
    if (!rd.open(path)) return nullptr;
    SketchResult* res = new SketchResult();

    // Streaming pipeline: the calling thread parses records and feeds a
    // BOUNDED queue; worker threads sketch and release each record's
    // sequence data. Peak resident sequence data = the queue bound, not
    // the whole file (a 5 GB single-file build used to hold every record
    // in RAM at once). Metadata (headers/lengths/window counts) and the
    // emitted triples still accumulate for all records.
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
    std::deque<std::pair<int64_t, std::string>> q;
    size_t q_bytes = 0;
    const size_t QCAP = 64;
    const size_t QBYTES = 256u << 20;
    bool done = false;

    int T = nthreads > 0 ? nthreads
                         : (int)std::thread::hardware_concurrency();
    if (T < 1) T = 1;
    auto work = [&]() {
        std::vector<uint8_t> codes;
        std::vector<uint32_t> hashes;
        for (;;) {
            std::pair<int64_t, std::string> item;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_pop.wait(lk, [&] { return !q.empty() || done; });
                if (q.empty()) return;
                item = std::move(q.front());
                q.pop_front();
                q_bytes -= item.second.size();
                cv_push.notify_one();
            }
            sketch_one((const uint8_t*)item.second.data(),
                       (int64_t)item.second.size(), k, s, win, stride,
                       codes, hashes, res->feat[(size_t)item.first],
                       res->wins[(size_t)item.first]);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < T; ++t) threads.emplace_back(work);

    Record rec;
    int64_t i = 0;
    for (;;) {
        int st = rd.next(rec);
        if (st < 0) {
            res->error = rd.error() ? rd.error() : "read error";
            break;  // error reported via mcio_sk_error
        }
        if (st == 0) break;
        int64_t L = (int64_t)rec.data.size();
        res->headers.push_back(rec.header);
        res->seq_lens.push_back(L);
        res->seq_windows.push_back((int32_t)num_windows_of(L, win, stride));
        res->feat.emplace_back();
        res->wins.emplace_back();
        if ((t0 + i) % num_shards == shard_id && L > 0) {
            std::unique_lock<std::mutex> lk(mu);
            cv_push.wait(lk, [&] {
                return q.empty() || (q.size() < QCAP && q_bytes < QBYTES);
            });
            q_bytes += rec.data.size();
            q.emplace_back(i, std::move(rec.data));
            cv_pop.notify_one();
        }
        ++i;
    }
    {
        std::lock_guard<std::mutex> lk(mu);
        done = true;
    }
    cv_pop.notify_all();
    for (auto& th : threads) th.join();
    for (auto& v : res->feat) res->n_triples += (int64_t)v.size();
    return res;
}

}  // extern "C"  (reopened below)

extern "C" void mcio_radix_sort_triples(uint32_t* f, int32_t* t, int32_t* w,
                                        int64_t n);

namespace {

// ---------------------------------------------------------------------------
// Streaming spill build: parse + sketch + per-shard sorted chunk files, with
// BOUNDED memory — triples never accumulate for the whole file. The
// replacement for holding a 5 Gbp file's ~700M triples (8.4 GB) in RAM
// before routing them to the external sorter (round-4 build peaked at 33 GB
// host RSS for a 10 GB table; reference scale is FULL RefSeq,
// script/ft/BuildGeneric_FT.sh). Matches the reference's streaming
// hash-map insertion (src/sketch_database.h:1079-1097) in spirit: bounded
// working set per input pass.

struct SpillChunkInfo {
    int64_t shard;
    int64_t index;   // per-shard chunk index
    int64_t count;
};

struct SpillResult {
    std::vector<std::string> headers;
    std::vector<int64_t> seq_lens;
    std::vector<int32_t> seq_windows;
    std::vector<SpillChunkInfo> chunks;
    std::string error;
};

// one shard's in-RAM chunk buffer
struct ShardBuf {
    std::vector<uint32_t> f;
    std::vector<int32_t> t, w;
    int64_t next_index = 0;
};

bool write_chunk(const std::string& prefix, int64_t shard, ShardBuf& b,
                 std::vector<SpillChunkInfo>& chunks, std::string& error) {
    int64_t n = (int64_t)b.f.size();
    if (n == 0) return true;
    // stable feature sort: buffer is filled in record order (= ascending
    // target, ascending window within), so the radix sort preserves the
    // reference's per-bucket insertion order (src/hash_multimap.h:653)
    mcio_radix_sort_triples(b.f.data(), b.t.data(), b.w.data(), n);
    char name[4096];
    snprintf(name, sizeof(name), "%s.s%lld.c%lld.bin", prefix.c_str(),
             (long long)shard, (long long)b.next_index);
    FILE* fp = fopen(name, "wb");
    if (!fp) {
        error = std::string("can't create spill chunk ") + name;
        return false;
    }
    bool ok = fwrite(&n, sizeof(int64_t), 1, fp) == 1 &&
              fwrite(b.f.data(), sizeof(uint32_t), (size_t)n, fp) ==
                  (size_t)n &&
              fwrite(b.t.data(), sizeof(int32_t), (size_t)n, fp) ==
                  (size_t)n &&
              fwrite(b.w.data(), sizeof(int32_t), (size_t)n, fp) ==
                  (size_t)n;
    ok = fclose(fp) == 0 && ok;
    if (!ok) {
        error = std::string("spill chunk write failed: ") + name;
        return false;
    }
    chunks.push_back({shard, b.next_index, n});
    ++b.next_index;
    b.f.clear();
    b.t.clear();
    b.w.clear();
    return true;
}

}  // namespace

extern "C" {

// Parse + sketch one file, spilling feature-sorted per-shard chunk files
// ("<prefix>.s<shard>.c<idx>.bin": int64 n, u32 f[n], i32 t[n], i32 w[n])
// instead of accumulating triples in RAM. Record i (target t0+i) is
// sketched iff owned by a requested shard ((t0+i) % num_shards in
// shard_ids). Peak memory = the parse queue (256 MB of sequence bytes) +
// a bounded reorder window of sketched-but-unspilled records + one chunk
// buffer per requested shard. Query with mcio_sp_*; free with
// mcio_sp_free.
void* mcio_sketch_file_spill(const char* path, int k, int s, int win,
                             int stride, int64_t t0, int64_t num_shards,
                             const int64_t* shard_ids, int64_t n_shard_ids,
                             int nthreads, int64_t chunk_triples,
                             const char* prefix) {
    if (s > 64 || k < 1 || k > 16 || chunk_triples < 1) return nullptr;
    SeqReader rd;
    if (!rd.open(path)) return nullptr;
    SpillResult* res = new SpillResult();
    std::vector<char> owned((size_t)num_shards, 0);
    for (int64_t i = 0; i < n_shard_ids; ++i) {
        if (shard_ids[i] >= 0 && shard_ids[i] < num_shards)
            owned[(size_t)shard_ids[i]] = 1;
    }
    std::vector<ShardBuf> bufs((size_t)num_shards);
    for (int64_t sh = 0; sh < num_shards; ++sh) {
        if (owned[(size_t)sh]) {
            bufs[(size_t)sh].f.reserve((size_t)chunk_triples);
            bufs[(size_t)sh].t.reserve((size_t)chunk_triples);
            bufs[(size_t)sh].w.reserve((size_t)chunk_triples);
        }
    }

    // pipeline state: parser (this thread) -> bounded queue -> sketch
    // workers -> per-record triple vectors -> spiller (in record order)
    std::mutex mu;
    std::condition_variable cv_push, cv_pop, cv_done;
    std::deque<std::pair<int64_t, std::string>> q;
    size_t q_bytes = 0;
    const size_t QCAP = 64;
    const size_t QBYTES = 256u << 20;
    // reorder window: completed-but-unspilled triples are also bounded, or
    // a slow spiller (sort + disk) would re-grow the whole-file working set
    const int64_t PENDING_MAX = chunk_triples * 2;
    bool done = false;
    bool io_failed = false;
    std::deque<std::vector<uint32_t>> feat;
    std::deque<std::vector<int32_t>> wins;
    std::deque<char> completed;
    int64_t pending_triples = 0;
    int64_t spill_next = 0;   // next record the spiller consumes

    int T = nthreads > 0 ? nthreads
                         : (int)std::thread::hardware_concurrency();
    if (T < 1) T = 1;
    auto work = [&]() {
        std::vector<uint8_t> codes;
        std::vector<uint32_t> hashes;
        for (;;) {
            std::pair<int64_t, std::string> item;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_pop.wait(lk, [&] { return !q.empty() || done; });
                if (q.empty()) return;
                item = std::move(q.front());
                q.pop_front();
                q_bytes -= item.second.size();
                cv_push.notify_one();
            }
            std::vector<uint32_t> f;
            std::vector<int32_t> w;
            sketch_one((const uint8_t*)item.second.data(),
                       (int64_t)item.second.size(), k, s, win, stride,
                       codes, hashes, f, w);
            {
                std::lock_guard<std::mutex> lk(mu);
                pending_triples += (int64_t)f.size();
                feat[(size_t)item.first] = std::move(f);
                wins[(size_t)item.first] = std::move(w);
                completed[(size_t)item.first] = 1;
                cv_done.notify_one();
            }
        }
    };
    auto spill = [&]() {
        for (;;) {
            std::vector<uint32_t> f;
            std::vector<int32_t> w;
            int64_t rec;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_done.wait(lk, [&] {
                    return (spill_next < (int64_t)completed.size() &&
                            completed[(size_t)spill_next]) ||
                           (done && q.empty() &&
                            spill_next >= (int64_t)completed.size());
                });
                if (spill_next >= (int64_t)completed.size()) break;
                rec = spill_next++;
                f = std::move(feat[(size_t)rec]);
                w = std::move(wins[(size_t)rec]);
                feat[(size_t)rec] = std::vector<uint32_t>();
                wins[(size_t)rec] = std::vector<int32_t>();
                pending_triples -= (int64_t)f.size();
                cv_push.notify_one();
            }
            if (f.empty() || io_failed) continue;
            int64_t sh = (t0 + rec) % num_shards;
            ShardBuf& b = bufs[(size_t)sh];
            int32_t tid = (int32_t)(t0 + rec);
            b.f.insert(b.f.end(), f.begin(), f.end());
            b.t.insert(b.t.end(), f.size(), tid);
            b.w.insert(b.w.end(), w.begin(), w.end());
            if ((int64_t)b.f.size() >= chunk_triples) {
                if (!write_chunk(prefix, sh, b, res->chunks, res->error)) {
                    std::lock_guard<std::mutex> lk(mu);
                    io_failed = true;
                }
            }
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < T; ++t) threads.emplace_back(work);
    std::thread spiller(spill);

    Record rec;
    int64_t i = 0;
    for (;;) {
        int st = rd.next(rec);
        if (st < 0) {
            res->error = rd.error() ? rd.error() : "read error";
            break;
        }
        if (st == 0) break;
        int64_t L = (int64_t)rec.data.size();
        int64_t sh = (t0 + i) % num_shards;
        bool own = owned[(size_t)sh] != 0;
        {
            std::unique_lock<std::mutex> lk(mu);
            res->headers.push_back(rec.header);
            res->seq_lens.push_back(L);
            res->seq_windows.push_back(
                (int32_t)num_windows_of(L, win, stride));
            feat.emplace_back();
            wins.emplace_back();
            completed.push_back(own && L > 0 ? 0 : 1);
            if (!(own && L > 0)) cv_done.notify_one();
            if (own && L > 0) {
                cv_push.wait(lk, [&] {
                    return (q.empty() ||
                            (q.size() < QCAP && q_bytes < QBYTES)) &&
                           pending_triples < PENDING_MAX;
                });
                q_bytes += rec.data.size();
                q.emplace_back(i, std::move(rec.data));
                cv_pop.notify_one();
            }
            if (io_failed) break;
        }
        ++i;
    }
    {
        std::lock_guard<std::mutex> lk(mu);
        done = true;
    }
    cv_pop.notify_all();
    for (auto& th : threads) th.join();
    cv_done.notify_all();
    spiller.join();
    // flush partial chunk buffers
    for (int64_t sh = 0; sh < num_shards; ++sh) {
        if (owned[(size_t)sh] && !io_failed) {
            if (!write_chunk(prefix, sh, bufs[(size_t)sh], res->chunks,
                             res->error))
                break;
        }
    }
    return res;
}

void mcio_sp_counts(void* vr, int64_t* n_records, int64_t* n_chunks,
                    int64_t* hdr_bytes) {
    SpillResult* r = (SpillResult*)vr;
    *n_records = (int64_t)r->seq_lens.size();
    *n_chunks = (int64_t)r->chunks.size();
    int64_t hb = 0;
    for (auto& h : r->headers) hb += (int64_t)h.size();
    *hdr_bytes = hb;
}

void mcio_sp_fetch(void* vr, char* headers, int64_t* hdr_off,
                   int64_t* seq_lens, int32_t* seq_windows,
                   int64_t* chunk_shard, int64_t* chunk_index,
                   int64_t* chunk_count) {
    SpillResult* r = (SpillResult*)vr;
    int64_t n = (int64_t)r->seq_lens.size();
    int64_t hp = 0;
    hdr_off[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        const auto& h = r->headers[(size_t)i];
        memcpy(headers + hp, h.data(), h.size());
        hp += (int64_t)h.size();
        hdr_off[i + 1] = hp;
        seq_lens[i] = r->seq_lens[(size_t)i];
        seq_windows[i] = r->seq_windows[(size_t)i];
    }
    for (size_t c = 0; c < r->chunks.size(); ++c) {
        chunk_shard[c] = r->chunks[c].shard;
        chunk_index[c] = r->chunks[c].index;
        chunk_count[c] = r->chunks[c].count;
    }
}

const char* mcio_sp_error(void* vr) {
    return ((SpillResult*)vr)->error.c_str();
}

void mcio_sp_free(void* vr) { delete (SpillResult*)vr; }

}  // extern "C"  (reopened below)

namespace {

// Buffered cursor over one spill chunk file (int64 n, f[n], t[n], w[n]).
struct ChunkCursor {
    FILE* fp = nullptr;
    int64_t n = 0;          // triples in the chunk
    int64_t consumed = 0;   // triples consumed so far
    // windowed buffers over the three arrays
    std::vector<uint32_t> bf;
    std::vector<int32_t> bt, bw;
    int64_t buf_pos = 0, buf_len = 0;
    int64_t f_base = 0;     // file offsets of the three arrays
    int64_t t_base = 0, w_base = 0;
    static const int64_t BUF = 1 << 20;   // triples per refill (12 MB)

    bool open(const char* path) {
        fp = fopen(path, "rb");
        if (!fp) return false;
        if (fread(&n, sizeof(int64_t), 1, fp) != 1) return false;
        f_base = (int64_t)sizeof(int64_t);
        t_base = f_base + n * (int64_t)sizeof(uint32_t);
        w_base = t_base + n * (int64_t)sizeof(int32_t);
        return refill();
    }
    bool refill() {
        int64_t left = n - consumed;
        buf_len = left < BUF ? left : BUF;
        buf_pos = 0;
        if (buf_len == 0) return true;
        bf.resize((size_t)buf_len);
        bt.resize((size_t)buf_len);
        bw.resize((size_t)buf_len);
        if (fseeko(fp, f_base + consumed * (int64_t)sizeof(uint32_t),
                   SEEK_SET) != 0 ||
            fread(bf.data(), sizeof(uint32_t), (size_t)buf_len, fp) !=
                (size_t)buf_len)
            return false;
        if (fseeko(fp, t_base + consumed * (int64_t)sizeof(int32_t),
                   SEEK_SET) != 0 ||
            fread(bt.data(), sizeof(int32_t), (size_t)buf_len, fp) !=
                (size_t)buf_len)
            return false;
        if (fseeko(fp, w_base + consumed * (int64_t)sizeof(int32_t),
                   SEEK_SET) != 0 ||
            fread(bw.data(), sizeof(int32_t), (size_t)buf_len, fp) !=
                (size_t)buf_len)
            return false;
        return true;
    }
    bool empty() const { return consumed >= n; }
    uint32_t feature() const { return bf[(size_t)buf_pos]; }
    int32_t tgt() const { return bt[(size_t)buf_pos]; }
    int32_t win() const { return bw[(size_t)buf_pos]; }
    bool advance() {   // returns false on IO error
        ++buf_pos;
        ++consumed;
        if (buf_pos >= buf_len && consumed < n) return refill();
        return true;
    }
    ~ChunkCursor() {
        if (fp) fclose(fp);
    }
};

// buffered appender for one output array file
struct OutFile {
    FILE* fp = nullptr;
    std::vector<uint8_t> buf;
    size_t pos = 0;
    static const size_t BUF = 4u << 20;

    bool open(const std::string& path) {
        fp = fopen(path.c_str(), "wb");
        if (fp) buf.resize(BUF);
        return fp != nullptr;
    }
    bool put(const void* p, size_t sz) {
        if (pos + sz > BUF) {
            if (fwrite(buf.data(), 1, pos, fp) != pos) return false;
            pos = 0;
        }
        memcpy(buf.data() + pos, p, sz);
        pos += sz;
        return true;
    }
    bool close() {
        bool ok = true;
        if (fp) {
            if (pos && fwrite(buf.data(), 1, pos, fp) != pos) ok = false;
            if (fclose(fp) != 0) ok = false;
            fp = nullptr;
        }
        return ok;
    }
    ~OutFile() {
        if (fp) fclose(fp);
    }
};

}  // namespace

extern "C" {

// K-way merge of feature-sorted spill chunk files into a CSR feature
// table, STREAMED to four output files: "<out>.keys.bin" (u32),
// "<out>.offs.bin" (i64, n_keys+1 entries), "<out>.lt.bin" /
// "<out>.lw.bin" (i32) — the finalize step of the bounded-memory build
// (FeatureTable construction without ever materializing the table in
// RAM; the reference's analogue is its per-rank hash-map serialization,
// src/sketch_database.h:1008-1045). Within one feature, locations emerge
// in (chunk index, position) order == global insertion order (chunks are
// written in record order), so the per-feature cap keeps the FIRST `cap`
// locations exactly like hash_multimap insertion + shrink. Returns the
// merged location count (or -1 on IO error) and writes the key count to
// *out_nkeys.
int64_t mcio_merge_chunks_csr(const char** paths, int64_t n_chunks,
                              int64_t cap, const char* out_prefix,
                              int64_t* out_nkeys) {
    std::vector<ChunkCursor> cur((size_t)n_chunks);
    for (int64_t c = 0; c < n_chunks; ++c) {
        if (!cur[(size_t)c].open(paths[c])) return -1;
    }
    std::string pre(out_prefix);
    OutFile fk, fo, ft, fw;
    if (!fk.open(pre + ".keys.bin") || !fo.open(pre + ".offs.bin") ||
        !ft.open(pre + ".lt.bin") || !fw.open(pre + ".lw.bin"))
        return -1;
    // binary min-heap of (feature << 20 | chunk) — chunk-index ties
    // preserve insertion order (chunk < 2^20)
    if (n_chunks >= (1 << 20)) return -1;
    std::vector<uint64_t> heap;
    heap.reserve((size_t)n_chunks);
    auto push = [&](uint64_t v) {
        heap.push_back(v);
        size_t i = heap.size() - 1;
        while (i > 0) {
            size_t p = (i - 1) / 2;
            if (heap[p] <= heap[i]) break;
            std::swap(heap[p], heap[i]);
            i = p;
        }
    };
    auto pop = [&]() {
        uint64_t top = heap[0];
        heap[0] = heap.back();
        heap.pop_back();
        size_t i = 0, n = heap.size();
        for (;;) {
            size_t l = 2 * i + 1, r = l + 1, m = i;
            if (l < n && heap[l] < heap[m]) m = l;
            if (r < n && heap[r] < heap[m]) m = r;
            if (m == i) break;
            std::swap(heap[i], heap[m]);
            i = m;
        }
        return top;
    };
    for (int64_t c = 0; c < n_chunks; ++c) {
        if (!cur[(size_t)c].empty())
            push(((uint64_t)cur[(size_t)c].feature() << 20) | (uint64_t)c);
    }
    int64_t nk = 0, nl = 0;
    int64_t zero = 0;
    if (!fo.put(&zero, sizeof(int64_t))) return -1;
    bool have_last = false;
    uint32_t last_key = 0;
    int64_t run_kept = 0;
    while (!heap.empty()) {
        uint64_t top = pop();
        uint32_t f = (uint32_t)(top >> 20);
        int64_t c = (int64_t)(top & ((1u << 20) - 1));
        ChunkCursor& cc = cur[(size_t)c];
        if (!have_last || f != last_key) {
            if (have_last) {
                if (!fo.put(&nl, sizeof(int64_t))) return -1;
            }
            if (!fk.put(&f, sizeof(uint32_t))) return -1;
            ++nk;
            last_key = f;
            have_last = true;
            run_kept = 0;
        }
        if (run_kept < cap) {
            int32_t t = cc.tgt(), w = cc.win();
            if (!ft.put(&t, sizeof(int32_t)) ||
                !fw.put(&w, sizeof(int32_t)))
                return -1;
            ++nl;
            ++run_kept;
        }
        if (!cc.advance()) return -1;
        if (!cc.empty())
            push(((uint64_t)cc.feature() << 20) | (uint64_t)c);
    }
    if (have_last) {
        if (!fo.put(&nl, sizeof(int64_t))) return -1;
    }
    if (!fk.close() || !fo.close() || !ft.close() || !fw.close()) return -1;
    *out_nkeys = nk;
    return nl;
}

// Sketch pre-parsed sequences (concatenated bytes + offsets); record i is
// sketched iff (t0+i) % num_shards == shard_id.
void* mcio_sketch_many(const uint8_t* seqs, const int64_t* off, int64_t n,
                       int k, int s, int win, int stride, int64_t t0,
                       int64_t num_shards, int64_t shard_id, int nthreads) {
    if (s > 64 || k < 1 || k > 16) return nullptr;
    SketchResult* res = new SketchResult();
    res->seq_lens.resize((size_t)n);
    res->seq_windows.assign((size_t)n, 0);
    res->feat.resize((size_t)n);
    res->wins.resize((size_t)n);
    std::atomic<int64_t> next(0);
    auto work = [&]() {
        std::vector<uint8_t> codes;
        std::vector<uint32_t> hashes;
        for (;;) {
            int64_t i = next.fetch_add(1);
            if (i >= n) break;
            int64_t L = off[i + 1] - off[i];
            res->seq_lens[(size_t)i] = L;
            res->seq_windows[(size_t)i] =
                (int32_t)num_windows_of(L, win, stride);
            if ((t0 + i) % num_shards != shard_id || L == 0) continue;
            sketch_one(seqs + off[i], L, k, s, win, stride, codes, hashes,
                       res->feat[(size_t)i], res->wins[(size_t)i]);
        }
    };
    int T = nthreads > 0 ? nthreads
                         : (int)std::thread::hardware_concurrency();
    if (T < 1) T = 1;
    if (T == 1) {
        work();
    } else {
        std::vector<std::thread> threads;
        for (int t = 0; t < T; ++t) threads.emplace_back(work);
        for (auto& th : threads) th.join();
    }
    for (auto& v : res->feat) res->n_triples += (int64_t)v.size();
    return res;
}

void mcio_sk_counts(void* vr, int64_t* n_records, int64_t* n_triples,
                    int64_t* hdr_bytes) {
    SketchResult* r = (SketchResult*)vr;
    *n_records = (int64_t)r->seq_lens.size();
    *n_triples = r->n_triples;
    int64_t hb = 0;
    for (auto& h : r->headers) hb += (int64_t)h.size();
    *hdr_bytes = hb;
}

// Copy results out. feat/tgt/win sized n_triples (tgt[i] = t0 + record);
// headers concatenated with hdr_off[n_records+1] prefix offsets (may be
// null when the caller used mcio_sketch_many); seq_lens / seq_windows
// sized n_records.
void mcio_sk_fetch(void* vr, int64_t t0, uint32_t* feat, int32_t* tgt,
                   int32_t* win, char* headers, int64_t* hdr_off,
                   int64_t* seq_lens, int32_t* seq_windows) {
    SketchResult* r = (SketchResult*)vr;
    int64_t n = (int64_t)r->seq_lens.size();
    int64_t pos = 0;
    for (int64_t i = 0; i < n; ++i) {
        const auto& f = r->feat[(size_t)i];
        const auto& w = r->wins[(size_t)i];
        if (!f.empty()) {
            memcpy(feat + pos, f.data(), f.size() * sizeof(uint32_t));
            memcpy(win + pos, w.data(), w.size() * sizeof(int32_t));
            for (size_t j = 0; j < f.size(); ++j)
                tgt[pos + (int64_t)j] = (int32_t)(t0 + i);
            pos += (int64_t)f.size();
        }
        seq_lens[i] = r->seq_lens[(size_t)i];
        seq_windows[i] = r->seq_windows[(size_t)i];
    }
    if (headers && hdr_off) {
        int64_t hp = 0;
        hdr_off[0] = 0;
        for (int64_t i = 0; i < (int64_t)r->headers.size(); ++i) {
            const auto& h = r->headers[(size_t)i];
            memcpy(headers + hp, h.data(), h.size());
            hp += (int64_t)h.size();
            hdr_off[i + 1] = hp;
        }
    }
}

const char* mcio_sk_error(void* vr) {
    return ((SketchResult*)vr)->error.c_str();
}

void mcio_sk_free(void* vr) { delete (SketchResult*)vr; }

// ---------------------------------------------------------------------------
// Standalone batch encoder: raw sequence bytes -> packed batch rows.
// Used by the build pipeline for long genome sequences (windows are cut
// on device). seqs = concatenated bytes, off[n+1] prefix offsets.
void mcio_encode_batch(const uint8_t* seqs, const int64_t* off, int64_t n,
                       int64_t Lmax, uint8_t* packed, uint8_t* ambig,
                       int32_t* lens) {
    const int64_t p4 = Lmax / 4, p8 = Lmax / 8;
    for (int64_t r = 0; r < n; ++r) {
        const uint8_t* s = seqs + off[r];
        int64_t len = off[r + 1] - off[r];
        if (len > Lmax) len = Lmax;
        lens[r] = (int32_t)len;
        uint8_t* pk = packed + r * p4;
        uint8_t* am = ambig + r * p8;
        for (int64_t i = 0; i < len; ++i) {
            uint8_t c = kLut.v[s[i]];
            if (c == 255)
                am[i >> 3] |= (uint8_t)(1u << (i & 7));
            else
                pk[i >> 2] |= (uint8_t)(c << ((i & 3) << 1));
        }
        for (int64_t i = len; i < Lmax; ++i)
            am[i >> 3] |= (uint8_t)(1u << (i & 7));
    }
}

// Stable LSD radix sort of (feature, target, window) triples by feature —
// the database-construction sort (FeatureTable.from_triples). A stable
// sort on the feature alone preserves the (target, window) insertion
// order inside each bucket, which the per-feature location-cap semantics
// require (src/hash_multimap.h insertion order). In-place on the caller's
// arrays; replaces numpy stable argsort + three fancy-index gathers.
void mcio_radix_sort_triples(uint32_t* f, int32_t* t, int32_t* w,
                             int64_t n) {
    if (n <= 1) return;
    std::vector<uint32_t> f2((size_t)n);
    std::vector<int32_t> t2((size_t)n), w2((size_t)n);
    uint32_t* fs = f;
    uint32_t* fd = f2.data();
    int32_t* ts = t;
    int32_t* td = t2.data();
    int32_t* ws = w;
    int32_t* wd = w2.data();
    int64_t count[256];
    for (int pass = 0; pass < 4; ++pass) {
        const int sh = pass * 8;
        memset(count, 0, sizeof(count));
        for (int64_t i = 0; i < n; ++i) ++count[(fs[i] >> sh) & 0xFF];
        int64_t pos = 0;
        for (int b = 0; b < 256; ++b) {
            int64_t c = count[b];
            count[b] = pos;
            pos += c;
        }
        for (int64_t i = 0; i < n; ++i) {
            int64_t p = count[(fs[i] >> sh) & 0xFF]++;
            fd[p] = fs[i];
            td[p] = ts[i];
            wd[p] = ws[i];
        }
        std::swap(fs, fd);
        std::swap(ts, td);
        std::swap(ws, wd);
    }
    // 4 passes = even number of swaps: result is back in the caller's arrays
}

// Full database-table construction: radix-sort the triples by feature
// (stable), then build the CSR structure (unique keys, offsets, location
// arrays capped at `cap` per feature, keeping the FIRST entries — the
// reference's insertion-order cap, src/hash_multimap.h:653) in one pass.
// The numpy formulation costs one full-array pass per step (run breaks,
// nonzero, diff, cumsum, boolean gather) — seconds each at 10^7 triples
// on slow hosts; this is a single C++ walk.
struct CsrResult {
    std::vector<uint32_t> keys;
    std::vector<int64_t> offsets;
    std::vector<int32_t> lt, lw;
};

void* mcio_build_table(uint32_t* f, int32_t* t, int32_t* w, int64_t n,
                       int64_t cap) {
    mcio_radix_sort_triples(f, t, w, n);
    CsrResult* r = new CsrResult();
    r->keys.reserve((size_t)(n / 2 + 1));
    r->offsets.reserve((size_t)(n / 2 + 2));
    r->lt.reserve((size_t)n);
    r->lw.reserve((size_t)n);
    r->offsets.push_back(0);
    int64_t i = 0;
    while (i < n) {
        uint32_t key = f[i];
        int64_t j = i;
        while (j < n && f[j] == key) ++j;
        int64_t take = j - i < cap ? j - i : cap;
        r->keys.push_back(key);
        for (int64_t k = i; k < i + take; ++k) {
            r->lt.push_back(t[k]);
            r->lw.push_back(w[k]);
        }
        r->offsets.push_back((int64_t)r->lt.size());
        i = j;
    }
    return r;
}

void mcio_table_counts(void* vr, int64_t* n_keys, int64_t* n_locs) {
    CsrResult* r = (CsrResult*)vr;
    *n_keys = (int64_t)r->keys.size();
    *n_locs = (int64_t)r->lt.size();
}

void mcio_table_fetch(void* vr, uint32_t* keys, int64_t* offsets,
                      int32_t* lt, int32_t* lw) {
    CsrResult* r = (CsrResult*)vr;
    memcpy(keys, r->keys.data(), r->keys.size() * sizeof(uint32_t));
    memcpy(offsets, r->offsets.data(), r->offsets.size() * sizeof(int64_t));
    memcpy(lt, r->lt.data(), r->lt.size() * sizeof(int32_t));
    memcpy(lw, r->lw.data(), r->lw.size() * sizeof(int32_t));
}

void mcio_table_free(void* vr) { delete (CsrResult*)vr; }

// P-way merge of shard CSR tables into one fused table, ordered by
// (feature, target, window) — the single-process fused-query view of a
// multi-shard database (load_all_shards). Each shard's table is already a
// stream sorted by that tuple (keys ascending; locations ascending
// (target, window) inside each bucket), and shards partition the targets,
// so a linear P-way merge replaces the numpy 3-key lexsort over ALL
// triples (3 stable argsorts + gathers — minutes at 700M triples).
//
// keys[s]/offs[s]/tgt[s]/win[s]: shard s's CSR arrays; nkeys[s] its key
// count. Outputs must be allocated for the worst case (sum of key counts,
// sum of location counts); returns the merged location count and writes
// the merged key count to *out_nkeys.
int64_t mcio_merge_shard_tables(int32_t P, const uint32_t** keys,
                                const int64_t** offs, const int64_t* nkeys,
                                const int32_t** tgt, const int32_t** win,
                                uint32_t* keys_out, int64_t* offs_out,
                                int32_t* tgt_out, int32_t* win_out,
                                int64_t* out_nkeys) {
    std::vector<int64_t> ki((size_t)P, 0), li((size_t)P, 0);
    for (int s = 0; s < P; ++s) {       // skip any leading empty buckets
        while (ki[s] < nkeys[s] && li[s] >= offs[s][ki[s] + 1]) ++ki[s];
    }
    int64_t nk = 0, nl = 0;
    bool have_last = false;
    uint32_t last_key = 0;
    for (;;) {
        int best = -1;
        uint32_t bf = 0;
        int32_t bt = 0, bw = 0;
        for (int s = 0; s < P; ++s) {
            if (ki[s] >= nkeys[s]) continue;
            uint32_t fsv = keys[s][ki[s]];
            int32_t tsv = tgt[s][li[s]];
            int32_t wsv = win[s][li[s]];
            if (best < 0 || fsv < bf ||
                (fsv == bf && (tsv < bt || (tsv == bt && wsv < bw)))) {
                best = s;
                bf = fsv;
                bt = tsv;
                bw = wsv;
            }
        }
        if (best < 0) break;
        if (!have_last || bf != last_key) {
            keys_out[nk] = bf;
            offs_out[nk] = nl;
            ++nk;
            last_key = bf;
            have_last = true;
        }
        tgt_out[nl] = bt;
        win_out[nl] = bw;
        ++nl;
        ++li[best];
        // advance past the bucket end (and any empty buckets)
        while (ki[best] < nkeys[best] &&
               li[best] >= offs[best][ki[best] + 1]) {
            ++ki[best];
        }
    }
    offs_out[nk] = nl;
    *out_nkeys = nk;
    return nl;
}

}  // extern "C"

// gwio — native IO + host-runtime layer for genomeworks_tpu.
//
// TPU-native re-implementation of the reference's native host components:
//  - FASTA/FASTQ(.gz) streaming parser (reference: common/io/src/
//    kseqpp_fasta_parser.cpp via 3rdparty kseq++): eager whole-file parse,
//    min-length filter, deterministic shuffle (std::mt19937(0), matching
//    kseqpp_fasta_parser.cpp:66-70);
//  - parallel 2-bit read packing into fixed-shape device-upload buffers
//    (reference analogue: cudamapper's host read gathering + H2D merge,
//    index_gpu.cuh:832-890) using a std::thread worker pool (reference
//    analogue: common/base utils/threadsafe_containers.hpp work
//    distribution).
//
// Exposed as a plain C ABI consumed from Python via ctypes (no pybind11).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct FastaSet {
    std::vector<std::string> names;
    std::vector<std::string> seqs;
    size_t max_len = 0;
};

// Streaming FASTA/FASTQ reader over gzFile (gzread handles plain files too).
class Reader {
  public:
    explicit Reader(gzFile f) : f_(f) {}
    // returns -1 on EOF
    int peek() {
        if (!have_) {
            int c = next_raw();
            cur_ = c;
            have_ = true;
        }
        return cur_;
    }
    int next() {
        int c = peek();
        have_ = false;
        return c;
    }
    void read_line(std::string& out) {
        out.clear();
        int c;
        while ((c = next()) != -1 && c != '\n') {
            if (c != '\r') out.push_back(static_cast<char>(c));
        }
    }
    void skip_line() {
        int c;
        while ((c = next()) != -1 && c != '\n') {
        }
    }

  private:
    int next_raw() {
        if (pos_ >= len_) {
            len_ = gzread(f_, buf_, sizeof(buf_));
            pos_ = 0;
            if (len_ <= 0) return -1;
        }
        return static_cast<unsigned char>(buf_[pos_++]);
    }
    gzFile f_;
    char buf_[1 << 16];
    int len_ = 0;
    int pos_ = 0;
    int cur_ = -1;
    bool have_ = false;
};

}  // namespace

extern "C" {

// Parse a FASTA/FASTQ(.gz) file. Returns an opaque handle (or nullptr).
// Reads shorter than min_sequence_length are dropped; shuffle != 0 applies
// the reference's deterministic std::mt19937(0) shuffle.
void* gw_fasta_parse(const char* path, int64_t min_sequence_length, int shuffle) {
    gzFile f = gzopen(path, "rb");
    if (!f) return nullptr;
    auto* set = new FastaSet();
    Reader r(f);
    std::string line;
    while (true) {
        int c = r.peek();
        if (c == -1) break;
        if (c == '>' || c == '@') {
            bool fastq = (c == '@');
            r.next();
            std::string header;
            r.read_line(header);
            // name = up to first whitespace (kseq semantics)
            size_t sp = header.find_first_of(" \t");
            std::string name = header.substr(0, sp);
            std::string seq;
            if (fastq) {
                r.read_line(seq);
                // '+' separator line, then quality of same length
                if (r.peek() == '+') {
                    r.skip_line();
                    size_t qlen = 0;
                    while (qlen < seq.size()) {
                        int q = r.next();
                        if (q == -1) break;
                        if (q != '\n' && q != '\r') qlen++;
                    }
                }
            } else {
                while (true) {
                    int p = r.peek();
                    if (p == -1 || p == '>') break;
                    r.read_line(line);
                    seq += line;
                }
            }
            if (static_cast<int64_t>(seq.size()) >= min_sequence_length) {
                set->names.emplace_back(std::move(name));
                set->seqs.emplace_back(std::move(seq));
            }
        } else {
            r.skip_line();
        }
    }
    gzclose(f);
    if (shuffle) {
        // deterministic shuffle for load balance
        // (kseqpp_fasta_parser.cpp:66-70: std::mt19937 g(0))
        std::vector<size_t> perm(set->seqs.size());
        std::iota(perm.begin(), perm.end(), size_t{0});
        std::mt19937 g(0);
        std::shuffle(perm.begin(), perm.end(), g);
        std::vector<std::string> names(set->names.size()), seqs(set->seqs.size());
        for (size_t i = 0; i < perm.size(); ++i) {
            names[i] = std::move(set->names[perm[i]]);
            seqs[i] = std::move(set->seqs[perm[i]]);
        }
        set->names = std::move(names);
        set->seqs = std::move(seqs);
    }
    for (const auto& s : set->seqs) set->max_len = std::max(set->max_len, s.size());
    return set;
}

int64_t gw_fasta_num_seqs(void* handle) {
    return static_cast<FastaSet*>(handle)->seqs.size();
}

int64_t gw_fasta_max_len(void* handle) {
    return static_cast<FastaSet*>(handle)->max_len;
}

int64_t gw_fasta_seq_len(void* handle, int64_t i) {
    return static_cast<FastaSet*>(handle)->seqs[i].size();
}

const char* gw_fasta_seq(void* handle, int64_t i) {
    return static_cast<FastaSet*>(handle)->seqs[i].c_str();
}

const char* gw_fasta_name(void* handle, int64_t i) {
    return static_cast<FastaSet*>(handle)->names[i].c_str();
}

void gw_fasta_free(void* handle) { delete static_cast<FastaSet*>(handle); }

// Pack reads [first, first+n) into a fixed-shape (n, max_len) 2-bit-code
// uint8 buffer + int32 length vector, in parallel. Encoding matches the
// reference's ASCII trick 0b11 & (c>>2 ^ c>>1) (cudamapper minimizer.cu:197).
void gw_fasta_pack_2bit(void* handle, int64_t first, int64_t n, int64_t max_len,
                        uint8_t* out_codes, int32_t* out_lens, int num_threads) {
    auto* set = static_cast<FastaSet*>(handle);
    if (num_threads <= 0) {
        num_threads = static_cast<int>(std::thread::hardware_concurrency());
        if (num_threads <= 0) num_threads = 1;
    }
    std::atomic<int64_t> next(0);
    auto worker = [&]() {
        while (true) {
            int64_t i = next.fetch_add(1);
            if (i >= n) break;
            const std::string& s = set->seqs[first + i];
            int64_t len = std::min<int64_t>(s.size(), max_len);
            out_lens[i] = static_cast<int32_t>(len);
            uint8_t* dst = out_codes + i * max_len;
            for (int64_t j = 0; j < len; ++j) {
                unsigned char c = static_cast<unsigned char>(s[j]);
                dst[j] = 0b11 & ((c >> 2) ^ (c >> 1));
            }
            std::memset(dst + len, 0, max_len - len);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 1; t < num_threads; ++t) threads.emplace_back(worker);
    worker();
    for (auto& th : threads) th.join();
}

// Pack a zero-padded base-character buffer (n_quads * 4 bytes, e.g. the
// (B, S, L) window matrix from poa._pack_windows with L % 4 == 0) into
// 2-bit codes, 4 bases/byte, using the reference's ASCII trick
// 0b11 & (c>>2 ^ c>>1) (cudamapper minimizer.cu:197): A=0 C=1 G=2 T=3;
// pad byte 0 also packs to 0. Returns 1 iff every byte is in
// {0, A, C, G, T} (the caller falls back to raw byte upload otherwise).
// Replaces a 5-pass numpy LUT+shift pipeline that cost ~180 ms per call
// on the 5776-window covid workload.
int gw_codes_pack_2bit(const uint8_t* in, int64_t n_quads, uint8_t* out) {
    static uint8_t ok_lut[256];
    static bool init = false;
    if (!init) {
        std::memset(ok_lut, 0, sizeof(ok_lut));
        ok_lut[0] = ok_lut['A'] = ok_lut['C'] = ok_lut['G'] = ok_lut['T'] = 1;
        init = true;
    }
    uint8_t ok = 1;
    for (int64_t i = 0; i < n_quads; ++i) {
        const uint8_t* q = in + 4 * i;
        ok &= ok_lut[q[0]] & ok_lut[q[1]] & ok_lut[q[2]] & ok_lut[q[3]];
        uint8_t c0 = 0b11 & ((q[0] >> 2) ^ (q[0] >> 1));
        uint8_t c1 = 0b11 & ((q[1] >> 2) ^ (q[1] >> 1));
        uint8_t c2 = 0b11 & ((q[2] >> 2) ^ (q[2] >> 1));
        uint8_t c3 = 0b11 & ((q[3] >> 2) ^ (q[3] >> 1));
        out[i] = static_cast<uint8_t>(c0 | (c1 << 2) | (c2 << 4) | (c3 << 6));
    }
    return ok;
}

}  // extern "C"

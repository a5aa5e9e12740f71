// Honest single-core CPU POA baseline (SPOA-style scalar C++).
//
// Implements the same algorithm chain as genomeworks_tpu/poa/cpu_reference.py
// (cudapoa's full-band semantics: backbone, sequence-vs-DAG NW with the
// reference traceback priority, add-alignment with aligned-node reuse, Kahn
// topological sort, heaviest-edge consensus with branch completion) in
// optimized scalar C++ — the fair "what one CPU core achieves" baseline the
// POA benchmark compares against (a NumPy-vectorized Python baseline
// understates the CPU and inflates the TPU multiple).
//
// Bit-identical outputs to cpu_reference.poa_consensus (same tie-breaks),
// verified by tests/test_native_spoa.py.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int E = 50;  // CUDAPOA_MAX_NODE_EDGES / MAX_NODE_ALIGNMENTS
constexpr int32_t NEG = INT32_MIN / 2;

struct Graph {
    int n = 0, max_nodes = 0;
    std::vector<uint8_t> base;
    std::vector<int32_t> in_e, in_w, out_e, al;
    std::vector<int32_t> in_c, out_c, al_c, cov;
    std::vector<int32_t> order, pos;

    void init(int cap) {
        max_nodes = cap;
        base.assign(cap, 0);
        in_e.assign((size_t)cap * E, 0);
        in_w.assign((size_t)cap * E, 0);
        out_e.assign((size_t)cap * E, 0);
        al.assign((size_t)cap * E, 0);
        in_c.assign(cap, 0);
        out_c.assign(cap, 0);
        al_c.assign(cap, 0);
        cov.assign(cap, 0);
        order.assign(cap, 0);
        pos.assign(cap, 0);
        n = 0;
    }
};

bool backbone(Graph& g, const uint8_t* s, int L) {
    if (L > g.max_nodes) return false;
    g.n = L;
    for (int i = 0; i < L; ++i) {
        g.base[i] = s[i];
        g.order[i] = i;
        g.pos[i] = i;
        g.in_c[i] = i > 0 ? 1 : 0;
        g.out_c[i] = i < L - 1 ? 1 : 0;
        g.al_c[i] = 0;
        g.cov[i] = 1;
        if (i > 0) {
            g.in_e[(size_t)i * E] = i - 1;
            g.in_w[(size_t)i * E] = 2;  // unit weights: prev + cur
        }
        if (i < L - 1) g.out_e[(size_t)i * E] = i + 1;
    }
    return true;
}

// full-band NW; returns alignment (backward order) in ag/ar, -1 on failure
int nw(const Graph& g, const uint8_t* read, int L, int gap, int mm, int match,
       std::vector<int32_t>& scores, std::vector<int32_t>& ag,
       std::vector<int32_t>& ar) {
    const int n = g.n, W = L + 1;
    scores.resize((size_t)(n + 1) * W);
    int32_t* s0 = scores.data();
    for (int j = 0; j <= L; ++j) s0[j] = j * gap;

    // column 0 boundary
    for (int gp = 0; gp < n; ++gp) {
        int nid = g.order[gp];
        int pc = g.in_c[nid];
        int32_t b = NEG;
        if (pc == 0) {
            b = 0;
        } else {
            for (int e = 0; e < pc; ++e) {
                int pi = g.pos[g.in_e[(size_t)nid * E + e]] + 1;
                int32_t v = scores[(size_t)pi * W];
                if (v > b) b = v;
            }
        }
        scores[(size_t)(gp + 1) * W] = b + gap;
    }

    std::vector<int32_t> sub(L);
    std::vector<int32_t> basev(L);
    for (int gp = 0; gp < n; ++gp) {
        int nid = g.order[gp];
        int pc = g.in_c[nid];
        uint8_t gb = g.base[nid];
        for (int j = 0; j < L; ++j) sub[j] = read[j] == gb ? match : mm;
        for (int j = 0; j < L; ++j) basev[j] = NEG;
        int np = pc == 0 ? 1 : pc;
        for (int p = 0; p < np; ++p) {
            int pi = pc == 0 ? 0 : g.pos[g.in_e[(size_t)nid * E + p]] + 1;
            const int32_t* pr = scores.data() + (size_t)pi * W;
            for (int j = 0; j < L; ++j) {
                int32_t c = pr[j] + sub[j];
                int32_t v = pr[j + 1] + gap;
                if (v > c) c = v;
                if (c > basev[j]) basev[j] = c;
            }
        }
        int32_t* row = scores.data() + (size_t)(gp + 1) * W;
        int32_t last = row[0];
        for (int j = 0; j < L; ++j) {
            int32_t v = basev[j];
            int32_t h = last + gap;
            if (h > v) v = h;
            row[j + 1] = v;
            last = v;
        }
    }

    // traceback start: first max at column L among sinks
    int bi = 0;
    int32_t best = INT32_MIN;
    for (int idx = 1; idx <= n; ++idx) {
        if (g.out_c[g.order[idx - 1]] == 0) {
            int32_t s = scores[(size_t)idx * W + L];
            if (best < s) {
                best = s;
                bi = idx;
            }
        }
    }

    ag.clear();
    ar.clear();
    int i = bi, j = L;
    int loops = 0, max_loops = L + n + 2;
    while (!(i == 0 && j == 0) && loops < max_loops) {
        ++loops;
        int32_t sij = scores[(size_t)i * W + j];
        int pi_ = 0, pj = 0;
        bool found = false;
        if (i != 0 && j != 0) {
            int nid = g.order[i - 1];
            int32_t mc = g.base[nid] == read[j - 1] ? match : mm;
            int pc = g.in_c[nid];
            int np = pc == 0 ? 1 : pc;
            for (int p = 0; p < np; ++p) {
                int pr = pc == 0 ? 0 : g.pos[g.in_e[(size_t)nid * E + p]] + 1;
                if (sij == scores[(size_t)pr * W + j - 1] + mc) {
                    pi_ = pr;
                    pj = j - 1;
                    found = true;
                    break;
                }
                if (pc == 0) break;
            }
        }
        if (!found && i != 0) {
            int nid = g.order[i - 1];
            int pc = g.in_c[nid];
            int np = pc == 0 ? 1 : pc;
            for (int p = 0; p < np; ++p) {
                int pr = pc == 0 ? 0 : g.pos[g.in_e[(size_t)nid * E + p]] + 1;
                if (sij == scores[(size_t)pr * W + j] + gap) {
                    pi_ = pr;
                    pj = j;
                    found = true;
                    break;
                }
                if (pc == 0) break;
            }
        }
        if (!found && sij == scores[(size_t)i * W + j - 1] + gap) {
            pi_ = i;
            pj = j - 1;
            found = true;
        }
        ag.push_back(i == pi_ ? -1 : g.order[i - 1]);
        ar.push_back(j == pj ? -1 : j - 1);
        i = pi_;
        j = pj;
    }
    return loops >= max_loops ? -1 : 0;
}

int add_alignment(Graph& g, const std::vector<int32_t>& ag,
                  const std::vector<int32_t>& ar, const uint8_t* read) {
    int head = -1;
    int prev_w = 0;
    for (int pos = (int)ag.size() - 1; pos >= 0; --pos) {
        int rp = ar[pos];
        if (rp == -1) continue;
        int w = 1;
        uint8_t b = read[rp];
        int gid = ag[pos];
        int cur;
        if (gid == -1) {
            cur = g.n++;
            if (g.n >= g.max_nodes) return 1;
            g.base[cur] = b;
            g.out_c[cur] = g.in_c[cur] = g.al_c[cur] = g.cov[cur] = 0;
        } else if (g.base[gid] == b) {
            cur = gid;
        } else {
            int na = g.al_c[gid];
            int aligned = -1;
            for (int t = 0; t < na; ++t) {
                int aid = g.al[(size_t)gid * E + t];
                if (g.base[aid] == b) {
                    aligned = aid;
                    break;
                }
            }
            if (aligned != -1) {
                cur = aligned;
            } else {
                cur = g.n++;
                if (g.n >= g.max_nodes) return 1;
                g.base[cur] = b;
                g.out_c[cur] = g.in_c[cur] = g.al_c[cur] = g.cov[cur] = 0;
                int new_al = 0;
                for (int t = 0; t < na; ++t) {
                    int aid = g.al[(size_t)gid * E + t];
                    g.al[(size_t)aid * E + g.al_c[aid]] = cur;
                    g.al_c[aid] += 1;
                    g.al[(size_t)cur * E + new_al++] = aid;
                }
                g.al[(size_t)gid * E + na] = cur;
                g.al_c[gid] = na + 1;
                g.al[(size_t)cur * E + new_al++] = gid;
                g.al_c[cur] = new_al;
            }
        }
        if (head != -1) {
            int ic = g.in_c[cur];
            bool exists = false;
            for (int e = 0; e < ic; ++e) {
                if (g.in_e[(size_t)cur * E + e] == head) {
                    exists = true;
                    g.in_w[(size_t)cur * E + e] += prev_w + w;
                }
            }
            if (!exists) {
                g.in_e[(size_t)cur * E + ic] = head;
                g.in_w[(size_t)cur * E + ic] = prev_w + w;
                g.in_c[cur] = ic + 1;
                int oc = g.out_c[head];
                g.out_e[(size_t)head * E + oc] = cur;
                g.out_c[head] = oc + 1;
                if (oc + 1 >= E || ic + 1 >= E) return 2;
            }
        }
        head = cur;
        g.cov[head] += 1;
        prev_w = w;
    }
    return 0;
}

bool topsort(Graph& g, std::vector<int32_t>& local) {
    int n = g.n;
    local.assign(g.in_c.begin(), g.in_c.begin() + n);
    int sp = 0;
    for (int nid = 0; nid < n; ++nid) {
        if (local[nid] == 0) {
            g.pos[nid] = sp;
            g.order[sp++] = nid;
        }
    }
    for (int i = 0; i < sp; ++i) {
        int node = g.order[i];
        for (int e = 0; e < g.out_c[node]; ++e) {
            int out = g.out_e[(size_t)node * E + e];
            if (--local[out] == 0) {
                g.pos[out] = sp;
                g.order[sp++] = out;
            }
        }
    }
    return sp == n;
}

int consensus(const Graph& g, std::vector<uint8_t>& out,
              std::vector<int32_t>& covout) {
    int n = g.n;
    std::vector<int64_t> scores(n, -1);
    std::vector<int32_t> pred(n, -1);
    int max_id = 0;
    int64_t max_s = -1;
    for (int gp = 0; gp < n; ++gp) {
        int nid = g.order[gp];
        int64_t s = scores[nid];
        for (int e = 0; e < g.in_c[nid]; ++e) {
            int64_t ew = g.in_w[(size_t)nid * E + e];
            int begin = g.in_e[(size_t)nid * E + e];
            if (s < ew || (s == ew && pred[nid] != -1 &&
                           scores[pred[nid]] <= scores[begin])) {
                s = ew;
                pred[nid] = begin;
            }
        }
        if (pred[nid] != -1) s += scores[pred[nid]];
        if (max_s <= s) {
            max_id = nid;
            max_s = s;
        }
        scores[nid] = s;
    }
    int loops = 0;
    while (g.out_c[max_id] != 0 && loops < n) {
        // branch completion (cudapoa_generate_consensus.cuh:35-120)
        int p = g.pos[max_id];
        int nid = g.order[p];
        for (int oe = 0; oe < g.out_c[nid]; ++oe) {
            int out_n = g.out_e[(size_t)nid * E + oe];
            for (int ie = 0; ie < g.in_c[out_n]; ++ie) {
                int iid = g.in_e[(size_t)out_n * E + ie];
                if (iid != nid) scores[iid] = -1;
            }
        }
        int64_t ms = 0;
        int nm = 0;
        for (int gp = p + 1; gp < n; ++gp) {
            int node = g.order[gp];
            pred[node] = -1;
            int64_t s = -1;
            for (int e = 0; e < g.in_c[node]; ++e) {
                int begin = g.in_e[(size_t)node * E + e];
                if (scores[begin] == -1) continue;
                int64_t ew = g.in_w[(size_t)node * E + e];
                if (s < ew || (s == ew && pred[node] != -1 &&
                               scores[pred[node]] <= scores[begin])) {
                    s = ew;
                    pred[node] = begin;
                }
            }
            if (pred[node] != -1) s += scores[pred[node]];
            if (ms <= s) {
                ms = s;
                nm = node;
            }
            scores[node] = s;
        }
        max_id = nm;
        ++loops;
    }
    if (loops >= n) return -1;

    out.clear();
    covout.clear();
    int nid = max_id;
    while (true) {
        out.push_back(g.base[nid]);
        int c = g.cov[nid];
        for (int a = 0; a < g.al_c[nid]; ++a)
            c += g.cov[g.al[(size_t)nid * E + a]];
        covout.push_back(c);
        if (pred[nid] == -1) break;
        nid = pred[nid];
    }
    return 0;
}

}  // namespace

extern "C" {

// Consensus of one window. seqs: concatenated reads; lens[nseqs]. Output:
// cons_out (forward order) + cov_out, capacity cons_cap. Returns consensus
// length, or -status on failure (-1 node cap, -2 edge cap, -3 loop).
int32_t gw_spoa_consensus(const char* seqs, const int32_t* lens,
                          int32_t nseqs, int32_t gap, int32_t mismatch,
                          int32_t match, char* cons_out, int32_t* cov_out,
                          int32_t cons_cap) {
    if (nseqs <= 0) return 0;
    int maxlen = 0;
    for (int i = 0; i < nseqs; ++i)
        if (lens[i] > maxlen) maxlen = lens[i];
    static thread_local Graph g;
    g.init(3 * maxlen);
    const uint8_t* p = (const uint8_t*)seqs;
    if (!backbone(g, p, lens[0])) return -1;
    p += lens[0];
    static thread_local std::vector<int32_t> scores, ag, ar, local;
    for (int s = 1; s < nseqs; ++s) {
        if (g.n >= g.max_nodes) return -1;
        if (nw(g, p, lens[s], gap, mismatch, match, scores, ag, ar) != 0)
            return -3;
        int rc = add_alignment(g, ag, ar, p);
        if (rc == 1) return -1;
        if (rc == 2) return -2;
        if (!topsort(g, local)) return -3;
        p += lens[s];
    }
    static thread_local std::vector<uint8_t> out;
    static thread_local std::vector<int32_t> covv;
    if (consensus(g, out, covv) != 0) return -3;
    int L = (int)out.size();
    if (L > cons_cap) return -3;
    for (int i = 0; i < L; ++i) {
        cons_out[i] = (char)out[(size_t)L - 1 - i];
        cov_out[i] = covv[(size_t)L - 1 - i];
    }
    return L;
}
}

// lz4tpu native engine: fast host-side LZ4 block codec + xxHash32.
//
// C++ implementation of the exact same semantics as the executable spec in
// lz4tpu/spec/block.py — which in turn states the algorithm of the reference
// (greedy parse: /root/reference/src/raw/compress/mod.rs:147-260, decoder:
// /root/reference/src/raw/decompress.rs:28-138).  Bit-exact output parity
// with the spec (and hence the C reference implementation) is enforced by
// differential tests in tests/test_native.py.
//
// Design notes (intentionally different from the Rust reference's shape):
//  * stateless C ABI — all state (encoder table, xxh32 state) lives in
//    caller-owned buffers so Python/numpy owns lifetime and the same table
//    arrays are shared with the spec and TPU engines;
//  * word-at-a-time match extension via 64-bit XOR + count-trailing-zeros;
//  * overlap copies use a doubling-span memcpy instead of per-byte loops.
//
// Built by lz4tpu/native/build.py; loaded via ctypes in
// lz4tpu/native/__init__.py.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i64 = int64_t;

// ---------------------------------------------------------------------------
// xxHash32
// ---------------------------------------------------------------------------

static const u32 P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                 P4 = 668265263u, P5 = 374761393u;

static inline u32 rotl32(u32 x, int r) { return (x << r) | (x >> (32 - r)); }

static inline u32 read32(const u8* p) {
    u32 v;
    std::memcpy(&v, p, 4);
    return v;  // little-endian hosts only (TPU hosts are x86-64/aarch64)
}
static inline u64 read64(const u8* p) {
    u64 v;
    std::memcpy(&v, p, 8);
    return v;
}

struct XXH32State {
    u32 v[4];
    u64 total;
    u32 buflen;
    u8 buf[16];
};

extern "C" void lz4tpu_xxh32_init(XXH32State* s, u32 seed) {
    s->v[0] = seed + P1 + P2;
    s->v[1] = seed + P2;
    s->v[2] = seed;
    s->v[3] = seed - P1;
    s->total = 0;
    s->buflen = 0;
}

static inline u32 xxh_round(u32 acc, u32 lane) {
    return rotl32(acc + lane * P2, 13) * P1;
}

extern "C" void lz4tpu_xxh32_update(XXH32State* s, const u8* data, u64 len) {
    s->total += len;
    if (s->buflen) {
        u64 need = 16 - s->buflen;
        u64 take = std::min(need, len);
        std::memcpy(s->buf + s->buflen, data, take);
        s->buflen += (u32)take;
        data += take;
        len -= take;
        if (s->buflen < 16) return;
        for (int i = 0; i < 4; i++) s->v[i] = xxh_round(s->v[i], read32(s->buf + 4 * i));
        s->buflen = 0;
    }
    u32 v0 = s->v[0], v1 = s->v[1], v2 = s->v[2], v3 = s->v[3];
    while (len >= 16) {
        v0 = xxh_round(v0, read32(data));
        v1 = xxh_round(v1, read32(data + 4));
        v2 = xxh_round(v2, read32(data + 8));
        v3 = xxh_round(v3, read32(data + 12));
        data += 16;
        len -= 16;
    }
    s->v[0] = v0; s->v[1] = v1; s->v[2] = v2; s->v[3] = v3;
    if (len) {
        std::memcpy(s->buf, data, len);
        s->buflen = (u32)len;
    }
}

extern "C" u32 lz4tpu_xxh32_digest(const XXH32State* s, u32 seed) {
    u32 h;
    if (s->total >= 16) {
        h = rotl32(s->v[0], 1) + rotl32(s->v[1], 7) + rotl32(s->v[2], 12) +
            rotl32(s->v[3], 18);
    } else {
        h = seed + P5;
    }
    h += (u32)s->total;
    const u8* p = s->buf;
    u32 rem = s->buflen;
    while (rem >= 4) {
        h = rotl32(h + read32(p) * P3, 17) * P4;
        p += 4;
        rem -= 4;
    }
    while (rem) {
        h = rotl32(h + (*p) * P5, 11) * P1;
        p++;
        rem--;
    }
    h ^= h >> 15;
    h *= P2;
    h ^= h >> 13;
    h *= P3;
    h ^= h >> 16;
    return h;
}

extern "C" u32 lz4tpu_xxh32(const u8* data, u64 len, u32 seed) {
    XXH32State s;
    lz4tpu_xxh32_init(&s, seed);
    lz4tpu_xxh32_update(&s, data, len);
    return lz4tpu_xxh32_digest(&s, seed);
}

// ---------------------------------------------------------------------------
// Raw block compressor
// ---------------------------------------------------------------------------

static const int HASHLOG = 12;
static const u64 MINMATCH = 4;
static const int SKIP_TRIGGER = 6;

// 5-byte hash of an LE u64 (spec/table.py hash_u32_table; positions with
// fewer than 8 readable bytes hash 0, as in the reference).
static inline u64 hash_u32t(const u8* in, u64 n, u64 off) {
    u64 v = (off + 8 <= n) ? read64(in + off) : 0;
    return ((v << 24) * 889523592379ULL) >> (64 - HASHLOG);
}
static inline u64 hash_u16t(const u8* in, u64 off) {
    return ((u64)(read32(in + off) * 2654435761u)) >> (32 - HASHLOG - 1);
}

struct U32TableRef {
    u32* slots;
    u64 offset;
    static const u64 kSlots = 1ull << HASHLOG;
    inline u64 replace(const u8* in, u64 n, u64 pos) {
        u64 h = hash_u32t(in, n, pos);
        u64 prev = slots[h];
        slots[h] = (u32)(pos + offset);
        return prev > offset ? prev - offset : 0;  // saturating
    }
};
struct U16TableRef {
    u16* slots;
    u64 offset;
    static const u64 kSlots = 2ull << HASHLOG;
    inline u64 replace(const u8* in, u64 /*n*/, u64 pos) {
        u64 h = hash_u16t(in, pos);
        u64 prev = slots[h];
        slots[h] = (u16)(pos + offset);
        return prev > offset ? prev - offset : 0;
    }
};

// Longest common prefix of in[a..a_end) and in[b..n), word-at-a-time.
static inline u64 count_matching(const u8* in, u64 a, u64 a_end, u64 b, u64 n) {
    u64 limit = std::min(a_end - a, n - b);
    u64 m = 0;
    while (m + 8 <= limit) {
        u64 x = read64(in + a + m) ^ read64(in + b + m);
        if (x) return m + (__builtin_ctzll(x) >> 3);
        m += 8;
    }
    while (m < limit && in[a + m] == in[b + m]) m++;
    return m;
}

// LSIC continuation bytes; returns bytes written (caller checked capacity).
static inline u64 lsic_tail(u8* out, u64 value) {
    if (value < 0xF) return 0;
    value -= 0xF;
    u64 k = value / 0xFF;
    std::memset(out, 0xFF, k);
    out[k] = (u8)(value % 0xFF);
    return k + 1;
}

// Greedy LZ4 parse (spec/block.py compress_block).  Returns compressed
// length, or -1 when `cap` (>=0) would be exceeded — in which case the
// encoder table keeps all mutations up to the abort point (linked-mode
// bit-exactness; see spec/block.py Incompressible docstring).
template <typename Table>
static i64 compress_impl(const u8* in, u64 n, u64 cursor, Table table_ref,
                         i64 cap, u64 acceleration,
                         u8* out, u64 out_capacity) {
    u64 out_pos = 0;
    const u64 init_cursor = cursor;
    u64 capu = cap < 0 ? ~0ull : (u64)cap;

    while (cursor < n) {
        const u64 literal_start = cursor;
        u64 step_counter = acceleration << SKIP_TRIGGER;
        u64 step = 1;
        u64 match_offset = 0, extra = 0;

        for (;;) {
            // tail guard: bail when the NEXT probe would pass n-11 — at
            // step==1 this is the reference's `n - cursor < 12`; at larger
            // steps it replicates C's `forwardIp > mflimitPlusOne` bail
            if (cursor + step + 11 > n) {  // end: literal-only tail
                u64 literal_len = n - literal_start;
                u64 group_len = 1 + (literal_len < 0xF ? 0 : (literal_len - 0xF) / 0xFF + 1) + literal_len;
                if (out_pos + group_len > capu || out_pos + group_len > out_capacity)
                    return -1;
                out[out_pos++] = (u8)(std::min<u64>(literal_len, 0xF) << 4);
                out_pos += lsic_tail(out + out_pos, literal_len);
                std::memcpy(out + out_pos, in + literal_start, literal_len);
                out_pos += literal_len;
                return (i64)out_pos;
            }

            u64 candidate = table_ref.replace(in, n, cursor);

            if (cursor != init_cursor && cursor - candidate <= 0xFFFF) {
                u64 matching = count_matching(in, cursor, n - 5, candidate, n);
                if (matching >= MINMATCH) {
                    extra = matching - MINMATCH;
                    match_offset = cursor - candidate;
                    // backtrack the match start into pending literals
                    u64 max_backtrack = cursor - literal_start;
                    u64 bt = 0;
                    while (bt < max_backtrack && candidate - bt > 0 &&
                           in[cursor - bt - 1] == in[candidate - bt - 1])
                        bt++;
                    extra += bt;
                    cursor += matching;
                    table_ref.replace(in, n, cursor - 2);
                    break;
                }
            }

            cursor += step;
            // step assignment lags one miss (C's forwardIp += step uses the
            // previous iteration's step): advances go 1, 1, a, a, ... —
            // byte-exact with LZ4_compress_fast for every acceleration
            if (literal_start + 1 != cursor) {
                step = step_counter >> SKIP_TRIGGER;
                step_counter++;
            }
        }

        const u64 literal_end = cursor - extra - MINMATCH;
        const u64 literal_len = literal_end - literal_start;
        const u64 group_len = 1 + (literal_len < 0xF ? 0 : (literal_len - 0xF) / 0xFF + 1) +
                              literal_len + 2 +
                              (extra < 0xF ? 0 : (extra - 0xF) / 0xFF + 1);
        if (out_pos + group_len > capu || out_pos + group_len > out_capacity) return -1;

        out[out_pos++] = (u8)((std::min<u64>(literal_len, 0xF) << 4) | std::min<u64>(extra, 0xF));
        out_pos += lsic_tail(out + out_pos, literal_len);
        std::memcpy(out + out_pos, in + literal_start, literal_len);
        out_pos += literal_len;
        out[out_pos++] = (u8)(match_offset & 0xFF);
        out[out_pos++] = (u8)(match_offset >> 8);
        out_pos += lsic_tail(out + out_pos, extra);
    }
    return (i64)out_pos;
}

extern "C" i64 lz4tpu_compress_block_u32(const u8* in, u64 n, u64 cursor, u32* table,
                              u64 table_offset, i64 cap, u64 acceleration,
                              u8* out, u64 out_capacity) {
    U32TableRef t{table, table_offset};
    return compress_impl(in, n, cursor, t, cap, acceleration, out, out_capacity);
}

extern "C" i64 lz4tpu_compress_block_u16(const u8* in, u64 n, u64 cursor, u16* table,
                              u64 table_offset, i64 cap, u64 acceleration,
                              u8* out, u64 out_capacity) {
    U16TableRef t{table, table_offset};
    return compress_impl(in, n, cursor, t, cap, acceleration, out, out_capacity);
}

// ---------------------------------------------------------------------------
// High-compression parse (hash-chain + lazy) — mirrors spec/hc.py exactly
// (differential-tested); see that module's docstring for the design.
// ---------------------------------------------------------------------------

static const int HASH_LOG_HC = 15;

static inline u32 hash4_hc(const u8* in, u64 pos) {
    return (read32(in + pos) * 2654435761u) >> (32 - HASH_LOG_HC);
}

struct HCState {
    std::vector<i64> head;  // hash -> last pos + 1 (0 = empty)
    std::vector<i64> prev;  // pos -> previous pos + 1 with same hash
    explicit HCState(u64 capacity)
        : head(1ull << HASH_LOG_HC, 0), prev(capacity, 0) {}
    inline void insert(const u8* in, u64 pos) {
        u32 h = hash4_hc(in, pos);
        prev[pos] = head[h];
        head[h] = (i64)pos + 1;
    }
};

extern "C" i64 lz4tpu_compress_block_hc(const u8* in, u64 n, u64 cursor,
                                        u64 level, i64 cap,
                                        u8* out, u64 out_capacity) {
    if (cursor >= n) return 0;
    u64 out_pos = 0;
    u64 capu = cap < 0 ? ~0ull : (u64)cap;

    HCState state(n);
    u64 hi = 0;  // positions [0, hi) are in the chains
    const u64 insert_limit = n >= MINMATCH - 1 ? n - (MINMATCH - 1) : 0;
    auto insert_up_to = [&](u64 q) {
        q = std::min(q, insert_limit);
        for (; hi < q; hi++) state.insert(in, hi);
    };
    insert_up_to(cursor);

    const u64 nb_attempts = std::min<u64>(1ull << (std::max<u64>(level, 2) - 1), 16384);
    const bool lazy = level >= 3;

    struct Best { u64 len, off, bt; };
    auto find_best = [&](u64 pos, u64 literal_start) -> Best {
        if (pos + 12 > n) return {0, 0, 0};
        Best best{0, 0, 0};
        i64 cand = state.prev[pos] - 1;  // skip the self entry at the head
        u64 tries = nb_attempts;
        u64 max_bt = pos - literal_start;
        while (cand >= 0 && tries > 0) {
            u64 off = pos - (u64)cand;
            if (off > 0xFFFF) break;  // chains are newest-first
            u64 fwd = count_matching(in, pos, n - 5, (u64)cand, n);
            if (fwd >= MINMATCH) {
                u64 bt = 0;
                while (bt < max_bt && (u64)cand - bt > 0 &&
                       in[pos - bt - 1] == in[(u64)cand - bt - 1])
                    bt++;
                if (fwd + bt > best.len) best = {fwd + bt, off, bt};
            }
            cand = state.prev[cand] - 1;
            tries--;
        }
        return best;
    };

    auto emit = [&](u64 literal_start, u64 literal_end, u64 offset, u64 extra) -> bool {
        u64 literal_len = literal_end - literal_start;
        u64 group_len = 1 + (literal_len < 0xF ? 0 : (literal_len - 0xF) / 0xFF + 1) +
                        literal_len + 2 + (extra < 0xF ? 0 : (extra - 0xF) / 0xFF + 1);
        if (out_pos + group_len > capu || out_pos + group_len > out_capacity)
            return false;
        out[out_pos++] = (u8)((std::min<u64>(literal_len, 0xF) << 4) |
                              std::min<u64>(extra, 0xF));
        out_pos += lsic_tail(out + out_pos, literal_len);
        std::memcpy(out + out_pos, in + literal_start, literal_len);
        out_pos += literal_len;
        out[out_pos++] = (u8)(offset & 0xFF);
        out[out_pos++] = (u8)(offset >> 8);
        out_pos += lsic_tail(out + out_pos, extra);
        return true;
    };

    u64 pos = cursor, literal_start = cursor;
    for (;;) {
        if (n - pos < 12) {  // literal-only tail
            u64 literal_len = n - literal_start;
            u64 group_len = 1 + (literal_len < 0xF ? 0 : (literal_len - 0xF) / 0xFF + 1) +
                            literal_len;
            if (out_pos + group_len > capu || out_pos + group_len > out_capacity)
                return -1;
            out[out_pos++] = (u8)(std::min<u64>(literal_len, 0xF) << 4);
            out_pos += lsic_tail(out + out_pos, literal_len);
            std::memcpy(out + out_pos, in + literal_start, literal_len);
            out_pos += literal_len;
            return (i64)out_pos;
        }
        insert_up_to(pos + 1);
        Best m = find_best(pos, literal_start);
        if (m.len == 0) { pos++; continue; }

        if (lazy && pos + 1 + 12 <= n) {
            insert_up_to(pos + 2);
            Best nx = find_best(pos + 1, literal_start);
            if (nx.len > m.len) { pos++; m = nx; }
        }
        u64 start = pos - m.bt;
        u64 end = pos + (m.len - m.bt);
        if (!emit(literal_start, start, m.off, m.len - MINMATCH)) return -1;
        insert_up_to(end);
        pos = end;
        literal_start = end;
    }
}

// ---------------------------------------------------------------------------
// Raw block decompressor
// ---------------------------------------------------------------------------

// error codes mirror spec/block.py DecodeError kinds
static const i64 ERR_UNEXPECTED_END = -1;
static const i64 ERR_MEMORY_LIMIT = -2;
static const i64 ERR_ZERO_OFFSET = -3;
static const i64 ERR_INVALID_OFFSET = -4;
static const i64 ERR_CAPACITY = -5;  // out buffer too small (caller bug)

// Overlap-aware backward copy: out[dst..dst+len) = out[dst-offset..), where
// the source may overlap the destination (pattern replication).  Uses a
// doubling span so even offset==1 runs in O(log len) memcpys.
static inline void copy_within(u8* out, u64 dst, u64 offset, u64 len) {
    if (offset >= len) {
        std::memcpy(out + dst, out + dst - offset, len);
        return;
    }
    u64 src = dst - offset;
    u64 avail = offset;
    u64 copied = 0;
    while (copied < len) {
        u64 chunk = std::min(avail, len - copied);
        std::memcpy(out + dst + copied, out + src, chunk);
        copied += chunk;
        avail += chunk;  // the pattern region just grew
    }
}

extern "C" i64 lz4tpu_decompress_block(const u8* in, u64 n, const u8* prefix, u64 prefix_len,
                            u8* out, u64 out_capacity, u64 output_limit) {
    u64 pos = 0, out_len = 0;
    while (pos < n) {
        u32 token = in[pos++];

        // literal length
        u64 literal_len = token >> 4;
        if (literal_len == 0xF) {
            for (;;) {
                if (pos >= n) return ERR_UNEXPECTED_END;
                u8 more = in[pos++];
                literal_len += more;
                if (more != 0xFF) break;
            }
        }
        if (pos + literal_len > n) return ERR_UNEXPECTED_END;
        if (out_len + literal_len > out_capacity) return ERR_CAPACITY;
        std::memcpy(out + out_len, in + pos, literal_len);
        out_len += literal_len;
        pos += literal_len;

        // a failed 2-byte offset read consumes nothing: with 1 byte left the
        // next iteration re-reads it as a token (spec/block.py)
        if (n - pos < 2) continue;
        u64 offset = in[pos] | ((u64)in[pos + 1] << 8);
        pos += 2;
        u64 match_len = token & 0xF;
        if (match_len == 0xF) {
            for (;;) {
                if (pos >= n) return ERR_UNEXPECTED_END;
                u8 more = in[pos++];
                match_len += more;
                if (more != 0xFF) break;
            }
        }
        match_len += MINMATCH;
        if (out_len + match_len > output_limit) return ERR_MEMORY_LIMIT;
        if (out_len + match_len > out_capacity) return ERR_CAPACITY;

        if (offset == 0) return ERR_ZERO_OFFSET;
        if (offset > out_len) {
            // serve the head of the match from the prefix (dictionary /
            // linked-block carry-over window)
            u64 prefix_needed = offset - out_len;
            if (prefix_needed > prefix_len) return ERR_INVALID_OFFSET;
            u64 take = std::min(prefix_needed, match_len);
            std::memcpy(out + out_len, prefix + prefix_len - prefix_needed, take);
            out_len += take;
            u64 remaining = match_len - take;
            if (remaining) {
                if (offset > out_len) return ERR_INVALID_OFFSET;
                copy_within(out, out_len, offset, remaining);
                out_len += remaining;
            }
        } else {
            copy_within(out, out_len, offset, match_len);
            out_len += match_len;
        }
    }
    return (i64)out_len;
}


// ---------------------------------------------------------------------------
// decode128 round model (batch scheduling).
//
// Replays a raw block's sequence stream through the lane kernel's
// lockstep-round state machine (SEQ2 two-phase rounds, mid-mirror,
// single far-page rebuild per round — lz4tpu/kernels/decode128.py) and
// returns the modeled round count.  The multi-batch scheduler sorts
// blocks by this so each 128-lane batch groups similar-cost lanes and
// the wall time approaches the sum of batch MEANS instead of
// n_batches * global max (tools/sim_d128_seqk.py; the same model
// predicted the measured rounds_max within 0.4%, PERF_NOTES round 3).
// Malformed streams return a best-effort count — this is scheduling
// advice, the decoder itself validates.

static inline bool model_parse_seq(const u8* in, u64 n, u64& pos,
                                   u64& lit, u64& off, u64& mlen) {
    if (pos >= n) return false;
    u32 tok = in[pos++];
    lit = tok >> 4;
    if (lit == 0xF) {
        for (;;) {
            if (pos >= n) return false;
            u8 b = in[pos++];
            lit += b;
            if (b != 0xFF) break;
        }
    }
    pos += lit;
    if (pos > n) { pos = n; off = 0; mlen = 0; return true; }
    if (n - pos < 2) { off = 0; mlen = 0; pos = n; return true; }  // tail
    off = in[pos] | ((u64)in[pos + 1] << 8);
    pos += 2;
    mlen = tok & 0xF;
    if (mlen == 0xF) {
        for (;;) {
            if (pos >= n) return false;
            u8 b = in[pos++];
            mlen += b;
            if (b != 0xFF) break;
        }
    }
    mlen += MINMATCH;
    return true;
}

extern "C" i64 lz4tpu_model_rounds(const u8* in, u64 n, u64 cb,
                                   u64 flush_thresh, u64 flush_b,
                                   u64 far_g_bytes, u64 mid_bytes) {
    u64 pos = 0;
    i64 rounds = 0, out = 0, flushed = 0;
    u64 lit_rem = 0, m_rem = 0, lag = 1;
    // guard: parse rounds are comp-bounded, chunk rounds output-bounded
    // (out grows monotonically), RLE lag-doubling adds a small constant
    while (lit_rem || m_rem || pos < n) {
        if (++rounds > (i64)(4 * n) + out / (i64)cb + 256) break;
        const i64 out0 = out;
        i64 slot = -2;  // the round's single far-rebuild group (-2 free)
        // use_mid: only phase 2 reads the mid mirror (phase 1 always
        // wins the round's rebuild, so mid service saves it nothing)
        auto far_ok = [&](i64 src, bool use_mid) -> bool {
            if (use_mid && mid_bytes && src >= flushed - (i64)mid_bytes) return true;
            i64 g = src / (i64)far_g_bytes;
            if (slot == -2) { slot = g; return true; }
            return slot == g;
        };
        // phase 1: parse when drained, then one literal + one match chunk
        if (!lit_rem && !m_rem) {
            u64 l, o, m;
            if (!model_parse_seq(in, n, pos, l, o, m)) break;
            lit_rem = l; m_rem = m; lag = o ? o : 1;
        }
        u64 lt = lit_rem < cb ? lit_rem : cb;
        lit_rem -= lt; out += (i64)lt;
        if (!lit_rem && m_rem) {
            i64 src = out - (i64)lag;
            if (src >= flushed || far_ok(src, false)) {
                u64 take = m_rem;
                if (take > cb) take = cb;
                if (take > lag) take = lag;
                if (take == lag && lag < cb) lag *= 2;
                m_rem -= take; out += (i64)take;
            }
        }
        // phase 2: second sequence in the same round when phase 1 drained
        if (!lit_rem && !m_rem && pos < n) {
            u64 l, o, m;
            if (!model_parse_seq(in, n, pos, l, o, m)) break;
            u64 ltB = l < cb ? l : cb;
            out += (i64)ltB;
            lit_rem = l - ltB; m_rem = m; lag = o ? o : 1;
            if (!lit_rem && m_rem) {
                i64 srcB = out - (i64)lag;
                u64 take = m_rem;
                if (take > cb) take = cb;
                if (take > lag) take = lag;
                // srcB >= out0: served from the in-register span window
                if (srcB < out0 && srcB + (i64)take > out0) take = (u64)(out0 - srcB);
                else if (srcB < flushed && !far_ok(srcB, true)) take = 0;
                if (take) {
                    if (take == lag && lag < cb) lag *= 2;
                    m_rem -= take; out += (i64)take;
                }
            }
        }
        // round-4 flush semantics: drain-to-residual (one sweep drains a
        // firing lane to flush_thresh - flush_b fill); FLUSH_K gating
        // only delays the drain <= K-1 rounds — immaterial for round
        // counts, so the model drains at the threshold
        if (out - flushed >= (i64)flush_thresh)
            flushed = out - ((i64)flush_thresh - (i64)flush_b);
    }
    return rounds;
}


// ---------------------------------------------------------------------------
// Window-aligned comp repack (decodebig host layout).
//
// Mirrors lz4tpu/kernels/decodebig.py::_repack_block: split a raw LZ4
// block stream into per-output-window chunks — chunk k holds the
// continuation bytes of a literal run crossing into window k, then the
// header + lsic + window-k literal bytes of every sequence STARTING in
// window k (matches consume no comp, so long matches leave later chunks
// empty).  This makes every lane's comp consumption uniform in OUTPUT
// space so decodebig's shared comp band advances in lockstep with its
// output band.  Doubles as hostile-input validation (negative
// DecodeError kinds, same codes as lz4tpu_decompress_block).
//
// Two-pass ABI: with out == nullptr only chunk_lens[] is filled (the
// caller sizes the batch stride win_r from the max chunk length), else
// chunk k's bytes are written at out + k*win_r.  Returns the chunk
// count, or a negative error.  total_out receives the decoded size.

extern "C" i64 lz4tpu_repack_window(const u8* in, u64 n, u64 output_limit,
                                    u32 ws_log, u64 win_r, u8* out,
                                    u64 out_cap, u32* chunk_lens,
                                    u64 max_chunks, u64* total_out) {
    const u64 W = (u64)1 << ws_log;
    std::memset(chunk_lens, 0, max_chunks * sizeof(u32));
    u64 n_chunks = 0;
    auto put = [&](u64 k, const u8* src, u64 len) -> bool {
        if (k >= max_chunks) return false;
        while (n_chunks <= k) chunk_lens[n_chunks++] = 0;
        if (out) {
            u64 at = k * win_r + chunk_lens[k];
            if (chunk_lens[k] + len > win_r || at + len > out_cap)
                return false;
            std::memcpy(out + at, src, len);
        }
        chunk_lens[k] += (u32)len;
        return true;
    };

    u64 pos = 0, outp = 0;
    while (pos < n) {
        u64 s0 = pos;
        u32 tok = in[pos++];
        u64 lit = tok >> 4;
        if (lit == 0xF) {
            for (;;) {
                if (pos >= n) return ERR_UNEXPECTED_END;
                u8 b = in[pos++];
                lit += b;
                if (b != 0xFF) break;
            }
        }
        u64 hdr_len = pos - s0;
        if (pos + lit > n) return ERR_UNEXPECTED_END;
        u64 k0 = outp >> ws_log;
        u64 first = ((k0 + 1) << ws_log) - outp;
        if (first > lit) first = lit;
        if (!put(k0, in + s0, hdr_len)) return ERR_CAPACITY;
        if (!put(k0, in + pos, first)) return ERR_CAPACITY;
        u64 x = first, j = k0 + 1;
        while (x < lit) {
            u64 t = lit - x < W ? lit - x : W;
            if (!put(j, in + pos + x, t)) return ERR_CAPACITY;
            x += t;
            ++j;
        }
        pos += lit;
        outp += lit;
        if (outp > output_limit + n) return ERR_MEMORY_LIMIT;
        if (pos >= n) break;  // literal-only tail
        if (pos + 2 > n) {
            // a single stray byte: the reference's read_u16 fails => tail;
            // keep the byte unread at the stream end (n - p == 1 < 2)
            if (!put(outp >> ws_log, in + pos, n - pos)) return ERR_CAPACITY;
            pos = n;
            break;
        }
        u64 m0 = pos;
        pos += 2;
        u64 ml = tok & 0xF;
        if (ml == 0xF) {
            for (;;) {
                if (pos >= n) return ERR_UNEXPECTED_END;
                u8 b = in[pos++];
                ml += b;
                if (b != 0xFF) break;
            }
        }
        if (!put(outp >> ws_log, in + m0, pos - m0)) return ERR_CAPACITY;
        outp += ml + MINMATCH;
        if (outp > output_limit) return ERR_MEMORY_LIMIT;
    }
    *total_out = outp;
    return (i64)n_chunks;
}

// ---------------------------------------------------------------------------
// Lane-table priming for the TPU lane compressor (compress128).
//
// Fills a transposed (1<<hashlog, 128) int32 table with packed
// pos17|tag15 entries for every 3rd window position (the reference's
// dictionary insertion order, framed/compress.rs:205-214), one window
// per lane.  Lane i's window is data[starts[i] - wlens[i], starts[i]);
// positions are in per-lane buffer coordinates [base_off_i, base_off_i
// + wlens[i]) where base_off_i is the window's byte offset inside the
// lane buffer.  The host-side NumPy version of this loop costs
// hundreds of ms on slow-vector hosts; this is a plain scalar walk.
extern "C" void lz4tpu_prime_tables(
    const u8* data, const i64* starts, const i64* wlens,
    const i64* base_offs, i64 n_lanes, i64 hashlog, int32_t* tables) {
    const i64 t_rows = (i64)1 << hashlog;
    const u32 shift = (u32)(32 - hashlog);
    for (i64 r = 0; r < t_rows; r++)
        for (i64 l = 0; l < 128; l++) tables[r * 128 + l] = 0x1FFFF;
    for (i64 l = 0; l < n_lanes; l++) {
        const i64 wlen = wlens[l];
        if (wlen < 16) continue;
        const u8* w = data + starts[l] - wlen;
        const i64 base = base_offs[l];
        for (i64 p = 0; p + 12 <= wlen; p += 3) {
            u32 v = (u32)w[p] | ((u32)w[p + 1] << 8) | ((u32)w[p + 2] << 16) |
                    ((u32)w[p + 3] << 24);
            u32 vm = v * 2654435761u;
            int32_t h = (int32_t)(vm >> shift);
            int32_t tag = (int32_t)((vm >> 6) & 0x7FFF);
            tables[(i64)h * 128 + l] = (int32_t)(base + p) | (tag << 17);
        }
    }
}

// Find the final (literal-only, end-of-stream) sequence of a raw LZ4
// block stream: its token position and literal count.  Used by the
// frame layer's chunk splicer — concatenating standalone streams is
// only valid if interior tails are merged into the next stream's first
// sequence (the format is end-delimited: a bare trailing literal token
// would make the decoder read the next chunk's bytes as its offset).
extern "C" i64 lz4tpu_tail_split(const u8* in, u64 n, u64* tail_pos,
                                 u64* tail_lit) {
    u64 pos = 0, last_tok = 0, last_lit = 0;
    while (pos < n) {
        last_tok = pos;
        u8 tok = in[pos++];
        u64 lit = tok >> 4;
        if (lit == 0xF) {
            for (;;) {
                if (pos >= n) return -1;
                u8 b = in[pos++];
                lit += b;
                if (b != 0xFF) break;
            }
        }
        pos += lit;
        last_lit = lit;
        if (pos >= n) {
            if (pos > n) return -1;
            break;  // literal-only tail ends the stream
        }
        if (pos + 2 > n) return -1;
        pos += 2;
        u64 ml = tok & 0xF;
        if (ml == 0xF) {
            for (;;) {
                if (pos >= n) return -1;
                u8 b = in[pos++];
                ml += b;
                if (b != 0xFF) break;
            }
        }
    }
    *tail_pos = last_tok;
    *tail_lit = last_lit;
    return 0;
}

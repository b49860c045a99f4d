// Native host-runtime kernels for ssd_tpu.
//
// The device compute path is JAX/XLA/Pallas; this library covers the
// host-side hot loops that sit between device dispatches (SURVEY §7.3 #2
// "keeping host logic off the hot loop"):
//  - XXH64 content hashing for the prefix cache (the reference links the
//    xxhash C library via the `xxhash` wheel, block_manager.py:49-55)
//  - batched decode/verify input tensorisation (slot maps, positions,
//    context lengths) replacing the per-token Python loops in
//    ModelRunner._prepare_multi_query (reference runner_helpers.py:50-121)
//
// Exposed via a plain C ABI and loaded with ctypes (no pybind11 in the
// image). Build: `make -C native` -> native/build/libssd_host.so.

#include <cstdint>
#include <cstring>
#include <cstddef>

// --------------------------------------------------------------------------
// XXH64 (implemented from the public xxHash specification)
// --------------------------------------------------------------------------

static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl64(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t xxh_round(uint64_t acc, uint64_t input) {
    acc += input * P2;
    acc = rotl64(acc, 31);
    acc *= P1;
    return acc;
}

static inline uint64_t xxh_merge(uint64_t acc, uint64_t val) {
    val = xxh_round(0, val);
    acc ^= val;
    acc = acc * P1 + P4;
    return acc;
}

extern "C" uint64_t ssd_xxh64(const uint8_t* p, size_t len, uint64_t seed) {
    const uint8_t* end = p + len;
    uint64_t h;
    if (len >= 32) {
        uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
        const uint8_t* limit = end - 32;
        do {
            uint64_t a, b, c, d;
            memcpy(&a, p, 8); memcpy(&b, p + 8, 8);
            memcpy(&c, p + 16, 8); memcpy(&d, p + 24, 8);
            v1 = xxh_round(v1, a); v2 = xxh_round(v2, b);
            v3 = xxh_round(v3, c); v4 = xxh_round(v4, d);
            p += 32;
        } while (p <= limit);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        h = xxh_merge(h, v1); h = xxh_merge(h, v2);
        h = xxh_merge(h, v3); h = xxh_merge(h, v4);
    } else {
        h = seed + P5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        uint64_t k;
        memcpy(&k, p, 8);
        h ^= xxh_round(0, k);
        h = rotl64(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        uint32_t k;
        memcpy(&k, p, 4);
        h ^= (uint64_t)k * P1;
        h = rotl64(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (uint64_t)(*p) * P5;
        h = rotl64(h, 11) * P1;
        p++;
    }
    h ^= h >> 33;
    h *= P2;
    h ^= h >> 29;
    h *= P3;
    h ^= h >> 32;
    return h;
}

// --------------------------------------------------------------------------
// Batched multi-query input prep (decode / verify / glue)
// --------------------------------------------------------------------------
// For each real sequence b < B with total length num_tokens[b], emit the
// trailing q_len tokens' (input_id, position, flat cache slot) triples and
// its context length; ghost rows b >= B keep the (0, 0, -1, 1) padding the
// jitted programs expect.

extern "C" void ssd_prepare_multi_query(
    const int32_t* tail_tokens,   // [B, q_len] last q_len token ids per seq
    const int32_t* num_tokens,    // [B]
    const int32_t* block_tables,  // [B_pad, M] (-1 padded)
    int32_t B, int32_t q_len, int32_t M, int32_t block_size, int32_t B_pad,
    int32_t* input_ids,           // out [B_pad * q_len]
    int32_t* positions,           // out [B_pad * q_len]
    int32_t* slot_map,            // out [B_pad * q_len]
    int32_t* context_lens         // out [B_pad]
) {
    for (int32_t i = 0; i < B_pad * q_len; i++) {
        input_ids[i] = 0;
        positions[i] = 0;
        slot_map[i] = -1;
    }
    for (int32_t b = 0; b < B_pad; b++) context_lens[b] = 1;

    for (int32_t b = 0; b < B; b++) {
        const int32_t nt = num_tokens[b];
        const int32_t start = nt - q_len;
        const int32_t* bt = block_tables + (size_t)b * M;
        context_lens[b] = nt;
        for (int32_t j = 0; j < q_len; j++) {
            const int32_t pos = start + j;
            const int32_t blk = bt[pos / block_size];
            const int32_t idx = b * q_len + j;
            input_ids[idx] = tail_tokens[b * q_len + j];
            positions[idx] = pos;
            slot_map[idx] = blk < 0 ? -1 : blk * block_size + pos % block_size;
        }
    }
}

// Single-sequence prefill prep: positions + slots for tokens
// [cached, cached+n_new) of one sequence.
extern "C" void ssd_prepare_prefill(
    const int32_t* block_table,   // [M]
    int32_t cached, int32_t n_new, int32_t block_size, int32_t s_pad,
    int32_t* positions,           // out [s_pad]
    int32_t* slot_map             // out [s_pad]
) {
    for (int32_t j = 0; j < s_pad; j++) {
        positions[j] = 0;
        slot_map[j] = -1;
    }
    for (int32_t j = 0; j < n_new; j++) {
        const int32_t pos = cached + j;
        const int32_t blk = block_table[pos / block_size];
        positions[j] = pos;
        slot_map[j] = blk < 0 ? -1 : blk * block_size + pos % block_size;
    }
}

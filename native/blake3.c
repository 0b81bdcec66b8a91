/* Compact BLAKE3 (hash + XOF) implemented from the public specification.
 *
 * Native counterpart of quill_tpu/hashing/blake3.py -- the Fiat-Shamir
 * transcript's hash chain (reference: /root/reference/transcript/src/
 * transcript.rs uses the blake3 crate).  Exposes a single-shot API:
 *
 *   void quill_blake3(const uint8_t *in, size_t len, uint8_t *out,
 *                     size_t out_len);
 *
 * producing the first out_len bytes of the BLAKE3 output stream (XOF).
 * Tree hashing follows the spec: 1024-byte chunks, left-heavy binary tree
 * over chunk chaining values.
 */

#include <stdint.h>
#include <string.h>
#include <stddef.h>

static const uint32_t IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};

static const uint8_t MSG_PERM[16] = {2, 6, 3, 10, 7, 0, 4, 13,
                                     1, 11, 12, 5, 9, 14, 15, 8};

#define CHUNK_START (1u << 0)
#define CHUNK_END (1u << 1)
#define PARENT (1u << 2)
#define ROOT (1u << 3)

#define BLOCK_LEN 64
#define CHUNK_LEN 1024

static inline uint32_t rotr32(uint32_t x, int n) {
    return (x >> n) | (x << (32 - n));
}

static inline void g(uint32_t *s, int a, int b, int c, int d, uint32_t mx,
                     uint32_t my) {
    s[a] = s[a] + s[b] + mx;
    s[d] = rotr32(s[d] ^ s[a], 16);
    s[c] = s[c] + s[d];
    s[b] = rotr32(s[b] ^ s[c], 12);
    s[a] = s[a] + s[b] + my;
    s[d] = rotr32(s[d] ^ s[a], 8);
    s[c] = s[c] + s[d];
    s[b] = rotr32(s[b] ^ s[c], 7);
}

static void compress(const uint32_t cv[8], const uint32_t block[16],
                     uint64_t counter, uint32_t block_len, uint32_t flags,
                     uint32_t out[16]) {
    uint32_t s[16];
    uint32_t m[16], perm[16];
    int r, i;
    for (i = 0; i < 8; i++) s[i] = cv[i];
    s[8] = IV[0]; s[9] = IV[1]; s[10] = IV[2]; s[11] = IV[3];
    s[12] = (uint32_t)counter;
    s[13] = (uint32_t)(counter >> 32);
    s[14] = block_len;
    s[15] = flags;
    memcpy(m, block, sizeof(m));
    for (r = 0; r < 7; r++) {
        g(s, 0, 4, 8, 12, m[0], m[1]);
        g(s, 1, 5, 9, 13, m[2], m[3]);
        g(s, 2, 6, 10, 14, m[4], m[5]);
        g(s, 3, 7, 11, 15, m[6], m[7]);
        g(s, 0, 5, 10, 15, m[8], m[9]);
        g(s, 1, 6, 11, 12, m[10], m[11]);
        g(s, 2, 7, 8, 13, m[12], m[13]);
        g(s, 3, 4, 9, 14, m[14], m[15]);
        if (r != 6) {
            for (i = 0; i < 16; i++) perm[i] = m[MSG_PERM[i]];
            memcpy(m, perm, sizeof(m));
        }
    }
    for (i = 0; i < 8; i++) {
        out[i] = s[i] ^ s[i + 8];
        out[i + 8] = s[i + 8] ^ cv[i];
    }
}

static void words_from_block(const uint8_t *data, size_t len,
                             uint32_t words[16]) {
    uint8_t buf[BLOCK_LEN];
    int i;
    memset(buf, 0, sizeof(buf));
    if (len > 0) memcpy(buf, data, len);
    for (i = 0; i < 16; i++) {
        words[i] = (uint32_t)buf[4 * i] | ((uint32_t)buf[4 * i + 1] << 8) |
                   ((uint32_t)buf[4 * i + 2] << 16) |
                   ((uint32_t)buf[4 * i + 3] << 24);
    }
}

/* Output node: enough state to produce root output bytes or a CV. */
typedef struct {
    uint32_t cv[8];
    uint32_t block[16];
    uint64_t counter;
    uint32_t block_len;
    uint32_t flags;
} output_t;

static void chunk_output(const uint8_t *chunk, size_t len,
                         uint64_t chunk_counter, output_t *out) {
    uint32_t cv[8];
    uint32_t words[16], tmp[16];
    size_t nblocks, i, blen;
    memcpy(cv, IV, sizeof(cv));
    nblocks = len == 0 ? 1 : (len + BLOCK_LEN - 1) / BLOCK_LEN;
    for (i = 0; i + 1 < nblocks; i++) {
        words_from_block(chunk + i * BLOCK_LEN, BLOCK_LEN, words);
        compress(cv, words, chunk_counter, BLOCK_LEN,
                 i == 0 ? CHUNK_START : 0, tmp);
        memcpy(cv, tmp, 8 * sizeof(uint32_t));
    }
    blen = len == 0 ? 0 : len - (nblocks - 1) * BLOCK_LEN;
    words_from_block(chunk + (nblocks - 1) * BLOCK_LEN, blen, out->block);
    memcpy(out->cv, cv, sizeof(cv));
    out->counter = chunk_counter;
    out->block_len = (uint32_t)blen;
    out->flags = CHUNK_END | (nblocks == 1 ? CHUNK_START : 0);
}

static void chaining_value(const output_t *o, uint32_t cv[8]) {
    uint32_t tmp[16];
    compress(o->cv, o->block, o->counter, o->block_len, o->flags, tmp);
    memcpy(cv, tmp, 8 * sizeof(uint32_t));
}

static void parent_output(const uint32_t l[8], const uint32_t r[8],
                          output_t *out) {
    memcpy(out->cv, IV, sizeof(out->cv));
    memcpy(out->block, l, 8 * sizeof(uint32_t));
    memcpy(out->block + 8, r, 8 * sizeof(uint32_t));
    out->counter = 0;
    out->block_len = BLOCK_LEN;
    out->flags = PARENT;
}

/* build the left-heavy tree over chunks [start, start+count) */
static void build_node(const uint8_t *data, uint64_t start, uint64_t count,
                       size_t total_len, output_t *out) {
    if (count == 1) {
        size_t off = (size_t)start * CHUNK_LEN;
        size_t len = total_len - off;
        if (len > CHUNK_LEN) len = CHUNK_LEN;
        chunk_output(data + off, len, start, out);
        return;
    }
    {
        uint64_t left = 1;
        output_t lo, ro;
        uint32_t lcv[8], rcv[8];
        while (left * 2 < count) left *= 2;
        build_node(data, start, left, total_len, &lo);
        build_node(data, start + left, count - left, total_len, &ro);
        chaining_value(&lo, lcv);
        chaining_value(&ro, rcv);
        parent_output(lcv, rcv, out);
    }
}

void quill_blake3(const uint8_t *in, size_t len, uint8_t *out,
                  size_t out_len) {
    output_t root;
    uint64_t nchunks = len == 0 ? 1 : ((uint64_t)len + CHUNK_LEN - 1) / CHUNK_LEN;
    uint64_t t = 0;
    size_t produced = 0;
    build_node(in, 0, nchunks, len, &root);
    while (produced < out_len) {
        uint32_t words[16];
        uint8_t block_bytes[64];
        size_t take, i;
        compress(root.cv, root.block, t, root.block_len, root.flags | ROOT,
                 words);
        for (i = 0; i < 16; i++) {
            block_bytes[4 * i] = (uint8_t)words[i];
            block_bytes[4 * i + 1] = (uint8_t)(words[i] >> 8);
            block_bytes[4 * i + 2] = (uint8_t)(words[i] >> 16);
            block_bytes[4 * i + 3] = (uint8_t)(words[i] >> 24);
        }
        take = out_len - produced;
        if (take > 64) take = 64;
        memcpy(out + produced, block_bytes, take);
        produced += take;
        t++;
    }
}

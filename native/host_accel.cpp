// Host-side native accelerators for snarkos_tpu.
//
// The reference's "native layer" is Rust (SURVEY.md §2: tokio/rayon node
// code + snarkVM crypto). Here the TPU owns the crypto compute; the
// host-side hot loops that remain — batch sha256d hashing for
// transmission IDs / worker partitioning (helpers/partition.rs:32-49
// equivalent), and bulk limb<->bytes conversion at the device boundary —
// are implemented in C++ and bound via ctypes (no pybind11 in the image).
//
// Build: make -C native   (produces libhostaccel.so)

#include <cstdint>
#include <cstring>

// ---------------------------------------------------------------------------
// SHA-256 (FIPS 180-4), compact implementation for batch hashing.
// ---------------------------------------------------------------------------

namespace {

struct Sha256Ctx {
    uint32_t state[8];
    uint64_t bitlen;
    uint8_t buffer[64];
    size_t buflen;
};

constexpr uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

void sha256_init(Sha256Ctx* c) {
    const uint32_t init[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                              0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    memcpy(c->state, init, sizeof(init));
    c->bitlen = 0;
    c->buflen = 0;
}

void sha256_block(Sha256Ctx* c, const uint8_t* p) {
    uint32_t w[64];
    for (int i = 0; i < 16; i++)
        w[i] = (uint32_t(p[i * 4]) << 24) | (uint32_t(p[i * 4 + 1]) << 16) |
               (uint32_t(p[i * 4 + 2]) << 8) | uint32_t(p[i * 4 + 3]);
    for (int i = 16; i < 64; i++) {
        uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
        uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = c->state[0], b = c->state[1], cc = c->state[2], d = c->state[3];
    uint32_t e = c->state[4], f = c->state[5], g = c->state[6], h = c->state[7];
    for (int i = 0; i < 64; i++) {
        uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = h + S1 + ch + K[i] + w[i];
        uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
        uint32_t maj = (a & b) ^ (a & cc) ^ (b & cc);
        uint32_t t2 = S0 + maj;
        h = g; g = f; f = e; e = d + t1;
        d = cc; cc = b; b = a; a = t1 + t2;
    }
    c->state[0] += a; c->state[1] += b; c->state[2] += cc; c->state[3] += d;
    c->state[4] += e; c->state[5] += f; c->state[6] += g; c->state[7] += h;
}

void sha256_update(Sha256Ctx* c, const uint8_t* data, size_t len) {
    c->bitlen += uint64_t(len) * 8;
    while (len > 0) {
        size_t take = 64 - c->buflen;
        if (take > len) take = len;
        memcpy(c->buffer + c->buflen, data, take);
        c->buflen += take;
        data += take;
        len -= take;
        if (c->buflen == 64) {
            sha256_block(c, c->buffer);
            c->buflen = 0;
        }
    }
}

void sha256_final(Sha256Ctx* c, uint8_t out[32]) {
    uint64_t bitlen = c->bitlen;
    uint8_t pad = 0x80;
    sha256_update(c, &pad, 1);
    uint8_t zero = 0;
    while (c->buflen != 56) sha256_update(c, &zero, 1);
    uint8_t lenb[8];
    for (int i = 0; i < 8; i++) lenb[i] = uint8_t(bitlen >> (56 - 8 * i));
    c->bitlen = bitlen;  // length bytes do not count
    // manual block write to avoid double-counting
    memcpy(c->buffer + 56, lenb, 8);
    sha256_block(c, c->buffer);
    for (int i = 0; i < 8; i++) {
        out[i * 4] = uint8_t(c->state[i] >> 24);
        out[i * 4 + 1] = uint8_t(c->state[i] >> 16);
        out[i * 4 + 2] = uint8_t(c->state[i] >> 8);
        out[i * 4 + 3] = uint8_t(c->state[i]);
    }
}

void sha256(const uint8_t* data, size_t len, uint8_t out[32]) {
    Sha256Ctx c;
    sha256_init(&c);
    sha256_update(&c, data, len);
    sha256_final(&c, out);
}

}  // namespace

extern "C" {

// sha256d over one buffer.
void ha_sha256d(const uint8_t* data, uint64_t len, uint8_t out[32]) {
    uint8_t tmp[32];
    sha256(data, len, tmp);
    sha256(tmp, 32, out);
}

// Batch sha256d: n items, each `item_len` bytes, contiguous; out n*32.
void ha_sha256d_batch(const uint8_t* data, uint64_t item_len, uint64_t n,
                      uint8_t* out) {
    for (uint64_t i = 0; i < n; i++)
        ha_sha256d(data + i * item_len, item_len, out + i * 32);
}

// Worker partition: double-sha256 of id bytes mod num_workers
// (helpers/partition.rs:40-67 equivalent).
void ha_assign_to_worker(const uint8_t* ids, uint64_t id_len, uint64_t n,
                         uint8_t num_workers, uint8_t* out) {
    uint8_t digest[32];
    for (uint64_t i = 0; i < n; i++) {
        ha_sha256d(ids + i * id_len, id_len, digest);
        out[i] = digest[0] % num_workers;
    }
}

// Bulk limb pack/unpack at the device boundary: 16-bit little-endian limb
// rows (int32 storage, limbs-first layout (L, B)) <-> packed LE byte
// strings of nbytes = 2*L per element.
void ha_limbs_to_bytes(const int32_t* limbs, uint64_t L, uint64_t B,
                       uint8_t* out) {
    for (uint64_t b = 0; b < B; b++) {
        for (uint64_t l = 0; l < L; l++) {
            uint16_t v = uint16_t(limbs[l * B + b] & 0xFFFF);
            out[b * 2 * L + 2 * l] = uint8_t(v & 0xFF);
            out[b * 2 * L + 2 * l + 1] = uint8_t(v >> 8);
        }
    }
}

void ha_bytes_to_limbs(const uint8_t* bytes, uint64_t L, uint64_t B,
                       int32_t* out) {
    for (uint64_t b = 0; b < B; b++) {
        for (uint64_t l = 0; l < L; l++) {
            out[l * B + b] = int32_t(uint32_t(bytes[b * 2 * L + 2 * l]) |
                                     (uint32_t(bytes[b * 2 * L + 2 * l + 1]) << 8));
        }
    }
}

}  // extern "C"

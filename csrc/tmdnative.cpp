// Native CPU utilities for torchmd-tpu.
//
// The reference offloads file parsing to external Python packages
// (moleculekit/parmed); our self-contained readers are pure Python with a
// C++ fast path here for the two genuinely hot host-side jobs:
//   * GROMACS XTC (xdr3dfcoord) trajectory decoding -- a bit-level
//     decompressor that is painfully slow in interpreted code, and
//   * bulk whitespace-separated float parsing for AMBER PRMTOP sections.
//
// Exposed as a plain C ABI for ctypes. Build: see torchmd_tpu/native.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------
// Fast float parsing
// ---------------------------------------------------------------------

// Parse whitespace-separated doubles from text[0..len). Returns the number
// parsed (up to max_out).
long tmd_parse_floats(const char* text, long len, double* out, long max_out) {
    long n = 0;
    const char* p = text;
    const char* end = text + len;
    while (p < end && n < max_out) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\r' || *p == '\t'))
            ++p;
        if (p >= end) break;
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) { ++p; continue; }
        out[n++] = v;
        p = next;
    }
    return n;
}

// ---------------------------------------------------------------------
// XTC (xdr3dfcoord) decoding
// ---------------------------------------------------------------------

static const int MAGICINTS[] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 10, 12, 16, 20, 25, 32, 40, 50, 64,
    80, 101, 128, 161, 203, 256, 322, 406, 512, 645, 812, 1024, 1290,
    1625, 2048, 2580, 3250, 4096, 5060, 6501, 8192, 10321, 13003, 16384,
    20642, 26007, 32768, 41285, 52015, 65536, 82570, 104031, 131072,
    165140, 208063, 262144, 330280, 416127, 524287, 660561, 832255,
    1048576, 1321122, 1664510, 2097152, 2642245, 3329021, 4194304,
    5284491, 6658042, 8388607, 10568983, 13316085, 16777216};
static const int FIRSTIDX = 9;

struct BitReader {
    const unsigned char* buf;
    long cnt;
    unsigned int lastbits;
    unsigned int lastbyte;
};

static unsigned int recv_bits(BitReader* br, int nbits) {
    unsigned int mask = (1u << nbits) - 1;
    unsigned int num = 0;
    unsigned int lastbits = br->lastbits;
    unsigned int lastbyte = br->lastbyte;
    long cnt = br->cnt;
    while (nbits >= 8) {
        lastbyte = (lastbyte << 8) | br->buf[cnt++];
        num |= (lastbyte >> lastbits) << (nbits - 8);
        nbits -= 8;
    }
    if (nbits > 0) {
        if ((int)lastbits < nbits) {
            lastbits += 8;
            lastbyte = (lastbyte << 8) | br->buf[cnt++];
        }
        lastbits -= nbits;
        num |= (lastbyte >> lastbits) & ((1u << nbits) - 1);
    }
    br->lastbits = lastbits;
    br->lastbyte = lastbyte;
    br->cnt = cnt;
    return num & mask;
}

static void recv_ints(BitReader* br, int num_of_bits, const int sizes[3],
                      int nums[3]) {
    unsigned char bytes[32];
    int nbytes = 0;
    while (num_of_bits > 8) {
        bytes[nbytes++] = (unsigned char)recv_bits(br, 8);
        num_of_bits -= 8;
    }
    if (num_of_bits > 0)
        bytes[nbytes++] = (unsigned char)recv_bits(br, num_of_bits);
    for (int i = 2; i > 0; --i) {
        unsigned long num = 0;
        for (int j = nbytes - 1; j >= 0; --j) {
            num = (num << 8) | bytes[j];
            unsigned long p = num / (unsigned long)sizes[i];
            bytes[j] = (unsigned char)p;
            num -= p * (unsigned long)sizes[i];
        }
        nums[i] = (int)num;
    }
    nums[0] = bytes[0];
    if (nbytes > 1) nums[0] |= ((int)bytes[1]) << 8;
    if (nbytes > 2) nums[0] |= ((int)bytes[2]) << 16;
    if (nbytes > 3) nums[0] |= ((int)bytes[3]) << 24;
}

static int sizeofint(int size) {
    unsigned int num = 1;
    int nbits = 0;
    while ((unsigned int)size >= num && nbits < 32) {
        ++nbits;
        num <<= 1;
    }
    return nbits;
}

static int sizeofints(const int sizes[3]) {
    unsigned char bytes[32];
    int nbytes = 1;
    bytes[0] = 1;
    for (int i = 0; i < 3; ++i) {
        unsigned long tmp = 0;
        int bytecnt;
        for (bytecnt = 0; bytecnt < nbytes; ++bytecnt) {
            tmp = bytes[bytecnt] * (unsigned long)sizes[i] + tmp;
            bytes[bytecnt] = (unsigned char)(tmp & 0xff);
            tmp >>= 8;
        }
        while (tmp != 0) {
            bytes[nbytes++] = (unsigned char)(tmp & 0xff);
            tmp >>= 8;
        }
    }
    unsigned int num = 1;
    int num_of_bits = 0;
    --nbytes;
    while (bytes[nbytes] >= num) {
        ++num_of_bits;
        num *= 2;
    }
    return num_of_bits + nbytes * 8;
}

static inline int read_be_i32(const unsigned char* p) {
    return (int)(((unsigned int)p[0] << 24) | ((unsigned int)p[1] << 16) |
                 ((unsigned int)p[2] << 8) | (unsigned int)p[3]);
}

static inline float read_be_f32(const unsigned char* p) {
    unsigned int u = ((unsigned int)p[0] << 24) | ((unsigned int)p[1] << 16) |
                     ((unsigned int)p[2] << 8) | (unsigned int)p[3];
    float f;
    memcpy(&f, &u, 4);
    return f;
}

// Decode all frames from an XTC byte buffer.
// Pass coords == NULL to count frames (returns nframes, sets *natoms_out).
// Otherwise coords must hold natoms*3*nframes floats (Angstrom, frame-major:
// coords[frame*natoms*3 + atom*3 + k]), box 3*nframes, steps/times nframes.
long tmd_xtc_decode(const unsigned char* data, long len, long* natoms_out,
                    double* coords, double* box, int* steps, float* times) {
    long off = 0;
    long frame = 0;
    long natoms_global = -1;
    while (off + 4 <= len) {
        if (read_be_i32(data + off) != 1995) return -2;
        long natoms = read_be_i32(data + off + 4);
        int step = read_be_i32(data + off + 8);
        float time = read_be_f32(data + off + 12);
        if (natoms_global < 0) natoms_global = natoms;
        if (natoms != natoms_global) return -3;
        double bx[3];
        for (int k = 0; k < 3; ++k)
            bx[k] = read_be_f32(data + off + 16 + (k * 3 + k) * 4) * 10.0;
        off += 16 + 36;

        long lsize = read_be_i32(data + off);
        off += 4;
        if (lsize <= 9) {
            if (coords) {
                for (long a = 0; a < lsize; ++a)
                    for (int k = 0; k < 3; ++k)
                        coords[(frame * natoms + a) * 3 + k] =
                            read_be_f32(data + off + (a * 3 + k) * 4) * 10.0;
            }
            off += 12 * lsize;
        } else {
            float precision = read_be_f32(data + off);
            int minint[3], maxint[3];
            for (int k = 0; k < 3; ++k)
                minint[k] = read_be_i32(data + off + 4 + 4 * k);
            for (int k = 0; k < 3; ++k)
                maxint[k] = read_be_i32(data + off + 16 + 4 * k);
            int smallidx = read_be_i32(data + off + 28);
            int nbytes = read_be_i32(data + off + 32);
            const unsigned char* cbuf = data + off + 36;
            off += 36 + ((nbytes + 3) / 4) * 4;

            if (coords) {
                int smaller = MAGICINTS[smallidx - 1 > FIRSTIDX ? smallidx - 1
                                                                : FIRSTIDX] / 2;
                int smallnum = MAGICINTS[smallidx] / 2;
                int sizesmall[3] = {MAGICINTS[smallidx], MAGICINTS[smallidx],
                                    MAGICINTS[smallidx]};
                int sizeint[3], bitsizeint[3];
                int bitsize;
                for (int k = 0; k < 3; ++k)
                    sizeint[k] = maxint[k] - minint[k] + 1;
                if ((sizeint[0] | sizeint[1] | sizeint[2]) > 0xffffff) {
                    for (int k = 0; k < 3; ++k)
                        bitsizeint[k] = sizeofint(sizeint[k]);
                    bitsize = 0;
                } else {
                    bitsize = sizeofints(sizeint);
                }

                BitReader br = {cbuf, 0, 0, 0};
                double inv_prec = 1.0 / precision;
                long i = 0;
                int run = 0;
                int prev[3] = {0, 0, 0};
                double* out = coords + frame * natoms * 3;
                long widx = 0;
                while (i < lsize) {
                    int thiscoord[3];
                    if (bitsize == 0) {
                        for (int k = 0; k < 3; ++k)
                            thiscoord[k] = (int)recv_bits(&br, bitsizeint[k]);
                    } else {
                        recv_ints(&br, bitsize, sizeint, thiscoord);
                    }
                    ++i;
                    for (int k = 0; k < 3; ++k) {
                        thiscoord[k] += minint[k];
                        prev[k] = thiscoord[k];
                    }
                    int flag = (int)recv_bits(&br, 1);
                    int is_smaller = 0;
                    if (flag == 1) {
                        run = (int)recv_bits(&br, 5);
                        is_smaller = run % 3;
                        run -= is_smaller;
                        is_smaller -= 1;
                    }
                    if (run > 0) {
                        for (int k2 = 0; k2 < run; k2 += 3) {
                            int sc[3];
                            recv_ints(&br, smallidx, sizesmall, sc);
                            ++i;
                            for (int k = 0; k < 3; ++k)
                                sc[k] += prev[k] - smallnum;
                            if (k2 == 0) {
                                int tmp;
                                for (int k = 0; k < 3; ++k) {
                                    tmp = sc[k];
                                    sc[k] = prev[k];
                                    prev[k] = tmp;
                                }
                                for (int k = 0; k < 3; ++k)
                                    out[widx * 3 + k] =
                                        prev[k] * inv_prec * 10.0;
                                ++widx;
                            } else {
                                for (int k = 0; k < 3; ++k)
                                    prev[k] = sc[k];
                            }
                            for (int k = 0; k < 3; ++k)
                                out[widx * 3 + k] = sc[k] * inv_prec * 10.0;
                            ++widx;
                        }
                    } else {
                        for (int k = 0; k < 3; ++k)
                            out[widx * 3 + k] = thiscoord[k] * inv_prec * 10.0;
                        ++widx;
                    }
                    smallidx += is_smaller;
                    if (is_smaller < 0) {
                        smallnum = smaller;
                        smaller = (smallidx > FIRSTIDX)
                                      ? MAGICINTS[smallidx - 1] / 2
                                      : 0;
                    } else if (is_smaller > 0) {
                        smaller = smallnum;
                        smallnum = MAGICINTS[smallidx] / 2;
                    }
                    sizesmall[0] = sizesmall[1] = sizesmall[2] =
                        MAGICINTS[smallidx];
                }
            }
        }
        if (coords) {
            for (int k = 0; k < 3; ++k) box[frame * 3 + k] = bx[k];
            steps[frame] = step;
            times[frame] = time;
        }
        ++frame;
    }
    *natoms_out = natoms_global;
    return frame;
}

}  // extern "C"

// starch3-tpu native host runtime.
//
// The reference keeps its codec layer in native code (bundled patched
// bzip2 1.0.6 + the C++ pipeline, reference makefile:32-43); this module
// is the rebuild's native tier for the host-bound serial residue of the
// block codec — the stages that are not worth a TPU round-trip:
//
//   - bzip2 Huffman code-length construction (weight-packed heap with the
//     format's exact tie-breaking; see starch3_tpu/codec/huffman.py for
//     the behavioral spec — this is a fresh implementation of the same
//     published algorithm, not copied code)
//   - MSB-first bit packing of (value, nbits) field arrays
//   - sequential MTF ranks (the list walk is branchy scalar code; the C
//     loop beats vectorized formulations for host-side use)
//   - RLE1 stream segmentation with libbz2-exact block boundaries
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
// Every function has a NumPy fallback in Python; the loader
// (runtime/__init__.py) decides per-process.

#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// Huffman code lengths: bzip2's weight-packed heap construction.
// freq: int64[alpha]; out_lengths: int32[alpha]; returns 0 on success.
// ---------------------------------------------------------------------------
static inline int64_t add_weights(int64_t w1, int64_t w2) {
    int64_t d1 = w1 & 0xff, d2 = w2 & 0xff;
    return ((w1 & ~0xffLL) + (w2 & ~0xffLL)) | (1 + (d1 > d2 ? d1 : d2));
}

int s3_make_code_lengths(const int64_t* freq, int32_t alpha, int32_t max_len,
                         int32_t* out_lengths) {
    if (alpha < 2 || alpha > 258) return -1;
    int64_t weight[2 * 258 + 2];
    int32_t parent[2 * 258 + 2];
    int32_t heap[258 + 2];

    int64_t base[258];
    for (int i = 0; i < alpha; i++)
        base[i] = (freq[i] == 0 ? 1 : freq[i]) << 8;

    for (;;) {
        int n_nodes = alpha;
        int n_heap = 0;
        heap[0] = 0;
        weight[0] = 0;
        parent[0] = -2;
        for (int i = 1; i <= alpha; i++) {
            parent[i] = -1;
            weight[i] = base[i - 1];
            n_heap++;
            heap[n_heap] = i;
            // upheap
            int z = n_heap;
            int tmp = heap[z];
            while (weight[tmp] < weight[heap[z >> 1]]) {
                heap[z] = heap[z >> 1];
                z >>= 1;
            }
            heap[z] = tmp;
        }
        while (n_heap > 1) {
            int n1, n2;
            // pop twice with downheap
            for (int rep = 0; rep < 2; rep++) {
                int& who = rep == 0 ? n1 : n2;
                who = heap[1];
                heap[1] = heap[n_heap];
                n_heap--;
                int z = 1, tmp = heap[z];
                for (;;) {
                    int yy = z << 1;
                    if (yy > n_heap) break;
                    if (yy < n_heap && weight[heap[yy + 1]] < weight[heap[yy]]) yy++;
                    if (weight[tmp] < weight[heap[yy]]) break;
                    heap[z] = heap[yy];
                    z = yy;
                }
                heap[z] = tmp;
            }
            n_nodes++;
            parent[n1] = parent[n2] = n_nodes;
            weight[n_nodes] = add_weights(weight[n1], weight[n2]);
            parent[n_nodes] = -2;
            n_heap++;
            heap[n_heap] = n_nodes;
            int z = n_heap, tmp = heap[z];
            while (weight[tmp] < weight[heap[z >> 1]]) {
                heap[z] = heap[z >> 1];
                z >>= 1;
            }
            heap[z] = tmp;
        }
        bool too_long = false;
        for (int i = 1; i <= alpha; i++) {
            int j = 0, k = i;
            while (parent[k] >= 0) {
                k = parent[k];
                j++;
            }
            out_lengths[i - 1] = j;
            if (j > max_len) too_long = true;
        }
        if (!too_long) return 0;
        for (int i = 0; i < alpha; i++) {
            int64_t j = base[i] >> 8;
            base[i] = (1 + j / 2) << 8;
        }
    }
}

// ---------------------------------------------------------------------------
// MSB-first bit packing.  values: uint64[count] (already masked to nbits),
// nbits: int32[count].  Writes into out (caller-sized: total_bits/8 + 16),
// starting with an accumulator of acc_nbits bits.  Returns the number of
// whole bytes written; *tail/*tail_nbits receive the leftover bits.
// ---------------------------------------------------------------------------
int64_t s3_pack_bits(const uint64_t* values, const int32_t* nbits,
                     int64_t count, uint64_t acc, int32_t acc_nbits,
                     uint8_t* out, uint64_t* tail, int32_t* tail_nbits) {
    uint64_t reg = acc;  // bit accumulator, MSB-first semantics
    int32_t live = acc_nbits;
    int64_t nout = 0;
    for (int64_t i = 0; i < count; i++) {
        int32_t nb = nbits[i];
        reg = (reg << nb) | values[i];
        live += nb;
        while (live >= 8) {
            live -= 8;
            out[nout++] = (uint8_t)(reg >> live);
        }
        reg &= (live == 64) ? ~0ULL : ((1ULL << live) - 1);
    }
    *tail = reg;
    *tail_nbits = live;
    return nout;
}

// ---------------------------------------------------------------------------
// Sequential MTF ranks over a dense alphabet.  seq: int32[n] in [0,n_sym);
// out: int32[n].
// ---------------------------------------------------------------------------
void s3_mtf_ranks(const int32_t* seq, int64_t n, int32_t n_sym, int32_t* out) {
    uint8_t list[256];
    for (int i = 0; i < n_sym; i++) list[i] = (uint8_t)i;
    for (int64_t i = 0; i < n; i++) {
        uint8_t s = (uint8_t)seq[i];
        if (list[0] == s) {
            out[i] = 0;
            continue;
        }
        // walk + shift
        uint8_t prev = list[0];
        int j = 1;
        while (list[j] != s) {
            uint8_t t = list[j];
            list[j] = prev;
            prev = t;
            j++;
        }
        list[j] = prev;
        list[0] = s;
        out[i] = j;
    }
}

// ---------------------------------------------------------------------------
// RLE1 encode of one block's worth of input (no segmentation): writes the
// 4+count form.  Returns output length.  in: bytes[n]; out sized n + n/4.
// ---------------------------------------------------------------------------
int64_t s3_rle1_encode(const uint8_t* in, int64_t n, uint8_t* out) {
    int64_t o = 0;
    int64_t i = 0;
    while (i < n) {
        uint8_t c = in[i];
        int64_t j = i + 1;
        while (j < n && in[j] == c && j - i < 255) j++;
        int64_t run = j - i;
        if (run >= 4) {
            out[o] = out[o + 1] = out[o + 2] = out[o + 3] = c;
            out[o + 4] = (uint8_t)(run - 4);
            o += 5;
        } else {
            for (int64_t k = 0; k < run; k++) out[o++] = c;
        }
        i = j;
    }
    return o;
}

// ---------------------------------------------------------------------------
// RLE1 decode (inverse of the 4+count grammar).  Returns output length or
// -1 on truncated input.  out must be sized for the worst case
// (n/5*259 + 4).
// ---------------------------------------------------------------------------
int64_t s3_rle1_decode(const uint8_t* in, int64_t n, uint8_t* out,
                       int64_t out_cap) {
    int64_t o = 0, i = 0;
    while (i < n) {
        uint8_t c = in[i];
        int64_t j = i + 1;
        while (j < n && j < i + 4 && in[j] == c) j++;
        int64_t run = j - i;
        if (run == 4) {
            if (j >= n) return -1;
            int64_t total = 4 + in[j];
            if (o + total > out_cap) return -2;
            memset(out + o, c, (size_t)total);
            o += total;
            i = j + 1;
        } else {
            if (o + run > out_cap) return -2;
            memset(out + o, c, (size_t)run);
            o += run;
            i = j;
        }
    }
    return o;
}

// ---------------------------------------------------------------------------
// RLE1 stream segmentation with libbz2-exact block boundaries (the
// discipline documented in codec/rle1.py): blocks close when they hold
// >= 100000*level - 19 post-RLE bytes; the pending run carries into the
// next block except at EOF; block CRCs cover flushed original bytes.
//
// Outputs: out_buf receives the concatenated post-RLE1 block bytes;
// block_offsets[i] is the start of block i in out_buf (block_offsets[nb]
// = total); src_bounds[i] is the original-byte boundary ending block i.
// Returns the number of blocks, or -1 on overflow.
// ---------------------------------------------------------------------------
int64_t s3_rle1_split(const uint8_t* in, int64_t n, int32_t level,
                      uint8_t* out_buf, int64_t out_cap,
                      int64_t* block_offsets, int64_t* src_bounds,
                      int32_t max_blocks) {
    const int64_t nblock_max = 100000LL * level - 19;
    int64_t o = 0;          // write cursor in out_buf
    int64_t block_start = 0;  // start of current block in out_buf
    int64_t consumed = 0;
    int32_t nb = 0;
    int pend_ch = -1;
    int64_t pend_len = 0;

    auto flush_pending = [&]() -> bool {
        if (pend_len == 0) return true;
        int64_t need = pend_len >= 4 ? 5 : pend_len;
        if (o + need > out_cap) return false;
        if (pend_len >= 4) {
            out_buf[o] = out_buf[o + 1] = out_buf[o + 2] = out_buf[o + 3] =
                (uint8_t)pend_ch;
            out_buf[o + 4] = (uint8_t)(pend_len - 4);
            o += 5;
        } else {
            for (int64_t k = 0; k < pend_len; k++) out_buf[o++] = (uint8_t)pend_ch;
        }
        pend_len = 0;
        return true;
    };
    auto end_block = [&]() -> bool {
        if (nb >= max_blocks) return false;
        block_offsets[nb] = block_start;
        src_bounds[nb] = consumed - pend_len;
        nb++;
        block_start = o;
        return true;
    };

    int64_t i = 0;
    while (i < n) {
        uint8_t c = in[i];
        int64_t j = i + 1;
        while (j < n && in[j] == c) j++;
        int64_t rem = j - i;
        // first byte of the run flushes the previous pending tail
        if (!flush_pending()) return -1;
        pend_ch = c;
        pend_len = 1;
        rem--;
        consumed++;
        bool more = rem > 0 || j < n;
        if (more && (o - block_start) >= nblock_max) {
            if (!end_block()) return -1;
        }
        while (rem) {
            int64_t take = rem < (255 - pend_len) ? rem : (255 - pend_len);
            pend_len += take;
            rem -= take;
            consumed += take;
            if (rem) {
                if (!flush_pending()) return -1;
                pend_ch = c;
                pend_len = 1;
                rem--;
                consumed++;
                more = rem > 0 || j < n;
                if (more && (o - block_start) >= nblock_max) {
                    if (!end_block()) return -1;
                }
            }
        }
        i = j;
    }
    if (!flush_pending()) return -1;
    if (o > block_start || pend_len) {
        if (!end_block()) return -1;
    }
    block_offsets[nb] = o;
    return nb;
}

}  // extern "C"

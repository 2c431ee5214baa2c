// Native host runtime: FASTQ / SAM hot-path parsing.
//
// The reference's host side is C++ (kseq FASTQ reader, bseq_read_orig
// chunking at ext/TAL/ext/bseq.cpp:114; sortmardup's BamParser over
// sam_parse1). This library is the framework's equivalent: plain-C ABI
// (loaded via ctypes) that fills caller-allocated NumPy buffers, so the
// Python layer stays a thin orchestrator. Built by native/build.py.

#include <cstdint>
#include <cstring>

extern "C" {

static unsigned char CODE_LUT[256];
static int lut_ready = 0;

static void init_lut() {
    if (lut_ready) return;
    memset(CODE_LUT, 4, sizeof(CODE_LUT));
    CODE_LUT[(unsigned char)'A'] = 0; CODE_LUT[(unsigned char)'a'] = 0;
    CODE_LUT[(unsigned char)'C'] = 1; CODE_LUT[(unsigned char)'c'] = 1;
    CODE_LUT[(unsigned char)'G'] = 2; CODE_LUT[(unsigned char)'g'] = 2;
    CODE_LUT[(unsigned char)'T'] = 3; CODE_LUT[(unsigned char)'t'] = 3;
    lut_ready = 1;
}

// Parse complete FASTQ records from buf[0:n]. Returns #reads parsed;
// *consumed = bytes of complete records. codes/quals are (max_reads x
// max_len), names is (max_reads x name_cap) NUL-padded.
long parse_fastq_chunk(const char* buf, long n, long max_reads,
                       long max_len, unsigned char* codes,
                       unsigned char* quals, int32_t* lens, char* names,
                       long name_cap, long* consumed) {
    init_lut();
    long off = 0, r = 0;
    *consumed = 0;
    while (r < max_reads) {
        long start = off;
        if (off >= n || buf[off] != '@') break;
        // name line
        long e = off;
        while (e < n && buf[e] != '\n') e++;
        if (e >= n) break;
        long name_end = off + 1;
        while (name_end < e && buf[name_end] != ' ' &&
               buf[name_end] != '\t') name_end++;
        long name_len = name_end - (off + 1);
        if (name_len > name_cap - 1) name_len = name_cap - 1;
        memcpy(names + r * name_cap, buf + off + 1, name_len);
        memset(names + r * name_cap + name_len, 0, name_cap - name_len);
        off = e + 1;
        // sequence
        long s = off;
        while (off < n && buf[off] != '\n') off++;
        if (off >= n) { off = start; break; }
        long seq_len = off - s;
        long keep = seq_len < max_len ? seq_len : max_len;
        for (long i = 0; i < keep; i++)
            codes[r * max_len + i] = CODE_LUT[(unsigned char)buf[s + i]];
        for (long i = keep; i < max_len; i++)
            codes[r * max_len + i] = 4;
        off++;
        // '+' line
        while (off < n && buf[off] != '\n') off++;
        if (off >= n) { off = start; break; }
        off++;
        // quals
        long q = off;
        while (off < n && buf[off] != '\n') off++;
        if (off - q < seq_len && off >= n) { off = start; break; }
        for (long i = 0; i < keep; i++) {
            int v = (unsigned char)buf[q + i] - 33;
            quals[r * max_len + i] = v < 0 ? 0 : (v > 93 ? 93 : v);
        }
        for (long i = keep; i < max_len; i++) quals[r * max_len + i] = 0;
        if (off < n) off++;
        lens[r] = (int32_t)keep;
        r++;
        *consumed = off;
    }
    return r;
}

// Extract sortmardup's numeric duplicate-key fields from SAM body lines:
// flag, pos (1-based), mapq, leading/trailing clip lengths, cigar
// reference length, score (sum of quals >= 15, bam_record.cpp:7-16), and
// Illumina tile/x/y from QNAME (tbb/pair.cpp:22-49). Returns #records.
long parse_sam_numeric(const char* buf, long n, long max_recs,
                       int32_t* flag, int64_t* pos, int32_t* mapq,
                       int32_t* lead_clip, int32_t* tail_clip,
                       int32_t* ref_len, int32_t* score,
                       int32_t* tile, int32_t* tx, int32_t* ty,
                       int64_t* line_start, int64_t* line_end) {
    long off = 0, r = 0;
    while (off < n && r < max_recs) {
        long ls = off;
        long le = off;
        while (le < n && buf[le] != '\n') le++;
        if (buf[ls] == '@') { off = le + 1; continue; }
        if (le == ls) { off = le + 1; continue; }
        line_start[r] = ls;
        line_end[r] = le;
        // walk tab-separated fields
        long f = ls;
        int field = 0;
        long fstart[12];
        long fend[12];
        fstart[0] = ls;
        while (f <= le && field < 12) {
            if (f == le || buf[f] == '\t') {
                fend[field] = f;
                field++;
                if (field < 12) fstart[field] = f + 1;
            }
            f++;
        }
        if (field < 11) { off = le + 1; continue; }
        // QNAME tile/x/y: count ':' fields
        {
            long parts[16];
            int np = 0;
            parts[np++] = fstart[0];
            for (long i = fstart[0]; i < fend[0] && np < 16; i++)
                if (buf[i] == ':') parts[np++] = i + 1;
            int t = 0, x = 0, y = 0, ok = 0;
            int base = -1;
            if (np == 7) base = 4;
            else if (np == 6) base = 3;
            if (base > 0) {
                ok = 1;
                long idx[3] = {parts[base], parts[base + 1],
                               parts[base + 2]};
                long stop[3] = {parts[base + 1] - 1, parts[base + 2] - 1,
                                fend[0]};
                int vals[3] = {0, 0, 0};
                for (int k = 0; k < 3; k++) {
                    long v = 0;
                    for (long i = idx[k]; i < stop[k]; i++) {
                        if (buf[i] < '0' || buf[i] > '9') { ok = 0; break; }
                        v = v * 10 + (buf[i] - '0');
                        if (v >= 0x10000) { ok = 0; break; }
                    }
                    vals[k] = (int)v;
                    if (!ok) break;
                }
                if (ok) { t = vals[0]; x = vals[1]; y = vals[2]; }
            }
            tile[r] = ok ? t : 0;
            tx[r] = ok ? x : 0;
            ty[r] = ok ? y : 0;
        }
        // numeric columns
        long v = 0;
        for (long i = fstart[1]; i < fend[1]; i++)
            v = v * 10 + (buf[i] - '0');
        flag[r] = (int32_t)v;
        v = 0;
        for (long i = fstart[3]; i < fend[3]; i++)
            v = v * 10 + (buf[i] - '0');
        pos[r] = v;
        v = 0;
        for (long i = fstart[4]; i < fend[4]; i++)
            v = v * 10 + (buf[i] - '0');
        mapq[r] = (int32_t)v;
        // cigar: leading clips, trailing clips, reference length
        {
            int32_t lead = 0, tail = 0, rlen = 0;
            int seen_core = 0;
            long num = 0;
            for (long i = fstart[5]; i < fend[5]; i++) {
                char c = buf[i];
                if (c >= '0' && c <= '9') {
                    num = num * 10 + (c - '0');
                    continue;
                }
                if (c == 'S' || c == 'H') {
                    if (!seen_core) lead += (int32_t)num;
                    else tail += (int32_t)num;
                } else {
                    seen_core = 1;
                    tail = 0;
                    if (c == 'M' || c == 'D' || c == 'N' || c == '=' ||
                        c == 'X')
                        rlen += (int32_t)num;
                }
                num = 0;
            }
            lead_clip[r] = lead;
            tail_clip[r] = tail;
            ref_len[r] = rlen;
        }
        // score: QUAL column (field 10)
        {
            int32_t sc = 0;
            if (!(fend[10] - fstart[10] == 1 && buf[fstart[10]] == '*')) {
                for (long i = fstart[10]; i < fend[10]; i++) {
                    int q = (unsigned char)buf[i] - 33;
                    if (q >= 15) sc += q;
                }
            }
            score[r] = sc;
        }
        r++;
        off = le + 1;
    }
    return r;
}

}  // extern "C"

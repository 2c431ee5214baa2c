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
                       int64_t* line_start, int64_t* line_end,
                       int64_t* qn_start, int64_t* qn_end,
                       int64_t* rn_start, int64_t* rn_end) {
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
        qn_start[r] = fstart[0];
        qn_end[r] = fend[0];
        rn_start[r] = fstart[2];
        rn_end[r] = fend[2];
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

// --------------------------------------------------------------------------
// RNAME resolution + pairID assignment (BamParser::pop_record semantics,
// sortmardup/tbb/bam_parser.cpp:76-128): consecutive same-QNAME records
// form a group; each popped record1 consumes an id; the first
// non-ignorable same-group record still queued shares it.
// --------------------------------------------------------------------------

static long find_rid(const char* buf, long s, long e, const char* names,
                     const int32_t* name_off, long n_ref, long* cache) {
    long len = e - s;
    long c = *cache;
    if (c >= 0) {
        const char* nm = names + name_off[c];
        if ((long)strlen(nm) == len && memcmp(nm, buf + s, len) == 0)
            return c;
    }
    for (long i = 0; i < n_ref; i++) {
        const char* nm = names + name_off[i];
        if ((long)strlen(nm) == len && memcmp(nm, buf + s, len) == 0) {
            *cache = i;
            return i;
        }
    }
    return -1;
}

// Assign rid + pair_id for records previously scanned by
// parse_sam_numeric. qn_start/qn_end + rn_start/rn_end are the QNAME and
// RNAME column spans of each record (buf offsets).
void assign_rid_pairid(const char* buf, long n_recs,
                       const int64_t* qn_start, const int64_t* qn_end,
                       const int64_t* rn_start, const int64_t* rn_end,
                       const int32_t* flag, const char* names,
                       const int32_t* name_off, long n_ref,
                       int32_t* rid, int64_t* pair_id) {
    long cache = -1;
    for (long i = 0; i < n_recs; i++) {
        if (rn_end[i] - rn_start[i] == 1 && buf[rn_start[i]] == '*')
            rid[i] = -1;
        else
            rid[i] = (int32_t)find_rid(buf, rn_start[i], rn_end[i], names,
                                       name_off, n_ref, &cache);
    }
    const int32_t IGN = 0x4 | 0x100 | 0x800;
    int64_t next_id = 1;
    long i = 0;
    while (i < n_recs) {
        long j = i + 1;
        long ql = qn_end[i] - qn_start[i];
        while (j < n_recs && qn_end[j] - qn_start[j] == ql &&
               memcmp(buf + qn_start[j], buf + qn_start[i], ql) == 0)
            j++;
        // queue over [i, j)
        char taken[64];
        long g = j - i;
        if (g > 64) g = 64;
        for (long k = 0; k < g; k++) taken[k] = 0;
        for (long k = i; k < j; k++) pair_id[k] = 0;
        for (long k = 0; k < g; k++) {
            if (taken[k]) continue;
            taken[k] = 1;
            next_id++;
            if (flag[i + k] & IGN) continue;
            pair_id[i + k] = next_id - 1;
            for (long m = k + 1; m < g; m++) {
                if (!taken[m] && !(flag[i + m] & IGN)) {
                    pair_id[i + m] = next_id - 1;
                    taken[m] = 1;
                    break;
                }
            }
        }
        i = j;
    }
}

// --------------------------------------------------------------------------
// SAM -> raw BAM record encoding (htslib sam_format/bam_write1
// equivalent; record layout per SAM spec 4.2). Records are emitted in
// the caller-given order (already coordinate-sorted) with per-record
// flag overrides, so the Python layer only concatenates + BGZF-compresses.
// --------------------------------------------------------------------------

static unsigned char NT16_LUT[256];
static unsigned char CIGOP_LUT[256];
static int bam_lut_ready = 0;

static void init_bam_lut() {
    if (bam_lut_ready) return;
    const char* nt = "=ACMGRSVTWYHKDBN";
    for (int i = 0; i < 256; i++) NT16_LUT[i] = 15;
    for (int i = 0; i < 16; i++) {
        NT16_LUT[(unsigned char)nt[i]] = i;
        NT16_LUT[(unsigned char)(nt[i] + 32)] = i;  // lowercase
    }
    const char* ops = "MIDNSHP=X";
    for (int i = 0; i < 256; i++) CIGOP_LUT[i] = 255;
    for (int i = 0; i < 9; i++) CIGOP_LUT[(unsigned char)ops[i]] = i;
    bam_lut_ready = 1;
}

static int32_t sam_reg2bin(int64_t beg, int64_t end) {
    end--;
    if (beg >> 14 == end >> 14) return (int32_t)(((1 << 15) - 1) / 7 + (beg >> 14));
    if (beg >> 17 == end >> 17) return (int32_t)(((1 << 12) - 1) / 7 + (beg >> 17));
    if (beg >> 20 == end >> 20) return (int32_t)(((1 << 9) - 1) / 7 + (beg >> 20));
    if (beg >> 23 == end >> 23) return (int32_t)(((1 << 6) - 1) / 7 + (beg >> 23));
    if (beg >> 26 == end >> 26) return (int32_t)(((1 << 3) - 1) / 7 + (beg >> 26));
    return 0;
}

static void put_u32(char* p, uint32_t v) { memcpy(p, &v, 4); }
static void put_i32(char* p, int32_t v) { memcpy(p, &v, 4); }

// Encode records (one SAM line each, selected+ordered by line_start/
// line_end) into out. flag_override[i] < 0 keeps the original flag.
// Fills rec_off[n+1] (byte offsets into out), rid_out/pos_out/rlen_out
// (for BAI building). Returns bytes written, or -1 on overflow/parse error.
int64_t encode_bam_records(const char* buf,
                           const int64_t* line_start, const int64_t* line_end,
                           const int32_t* flag_override, long n_recs,
                           const char* names, const int32_t* name_off,
                           long n_ref,
                           char* out, int64_t out_cap,
                           int64_t* rec_off, int32_t* rid_out,
                           int64_t* pos_out, int32_t* rlen_out) {
    init_bam_lut();
    long cache = -1, cache2 = -1;
    int64_t w = 0;
    for (long r = 0; r < n_recs; r++) {
        long ls = line_start[r], le = line_end[r];
        // split into fields
        long fs[12], fe[12];
        int nf = 0;
        long f = ls;
        fs[0] = ls;
        while (f <= le && nf < 12) {
            if (f == le || buf[f] == '\t') {
                fe[nf] = f;
                nf++;
                if (nf < 12) fs[nf] = f + 1;
            }
            f++;
        }
        if (nf < 11) return -1;
        long tag_start = (nf == 12) ? fs[11] : le;

        // core fields
        int64_t v = 0;
        for (long i = fs[1]; i < fe[1]; i++) v = v * 10 + (buf[i] - '0');
        int32_t flag = flag_override[r] >= 0 ? flag_override[r] : (int32_t)v;
        int32_t rid = (fe[2] - fs[2] == 1 && buf[fs[2]] == '*') ? -1 :
            (int32_t)find_rid(buf, fs[2], fe[2], names, name_off, n_ref,
                              &cache);
        v = 0;
        for (long i = fs[3]; i < fe[3]; i++) v = v * 10 + (buf[i] - '0');
        int64_t pos0 = v - 1;
        int64_t mapq = 0;
        for (long i = fs[4]; i < fe[4]; i++)
            mapq = mapq * 10 + (buf[i] - '0');
        // cigar
        long n_cig = 0;
        int64_t rlen = 0;
        int star_cig = (fe[5] - fs[5] == 1 && buf[fs[5]] == '*');
        if (!star_cig) {
            for (long i = fs[5]; i < fe[5]; i++)
                if (buf[i] < '0' || buf[i] > '9') n_cig++;
        }
        // rnext / pnext / tlen
        int32_t nrid;
        if (fe[6] - fs[6] == 1 && buf[fs[6]] == '=') nrid = rid;
        else if (fe[6] - fs[6] == 1 && buf[fs[6]] == '*') nrid = -1;
        else nrid = (int32_t)find_rid(buf, fs[6], fe[6], names, name_off,
                                      n_ref, &cache2);
        v = 0;
        for (long i = fs[7]; i < fe[7]; i++) v = v * 10 + (buf[i] - '0');
        int64_t pnext0 = v - 1;
        int64_t tlen = 0;
        {
            int neg = 0;
            for (long i = fs[8]; i < fe[8]; i++) {
                if (buf[i] == '-') { neg = 1; continue; }
                tlen = tlen * 10 + (buf[i] - '0');
            }
            if (neg) tlen = -tlen;
        }
        long l_seq = (fe[9] - fs[9] == 1 && buf[fs[9]] == '*') ? 0
                     : fe[9] - fs[9];
        long l_qname = fe[0] - fs[0];

        // sizes: 32 core + qname+1 + 4*n_cig + (l_seq+1)/2 + l_seq + tags
        int64_t body = 32 + (l_qname + 1) + 4 * n_cig + (l_seq + 1) / 2 +
                       l_seq;
        // tags: conservatively text length (binary is never longer than
        // text for i/f/Z/A/B with our int32 encoding... 'i' text can be
        // 1 char -> 7 bytes binary; use text_len + 8 per tag margin)
        long n_tags = 0;
        if (nf == 12) {
            n_tags = 1;
            for (long i = tag_start; i < le; i++)
                if (buf[i] == '\t') n_tags++;
        }
        int64_t max_rec = 4 + body + (le - tag_start) + 8 * n_tags + 16;
        if (w + max_rec > out_cap) return -1;

        char* p0 = out + w;   // length prefix patched at the end
        char* p = p0 + 4;
        put_i32(p, rid);
        put_i32(p + 4, (int32_t)pos0);
        // compute rlen for bin
        // (second cigar pass below fills ops and accumulates rlen)
        char* pcig_hdr = p;   // we patch bin after cigar pass
        p[8] = (char)(l_qname + 1);
        p[9] = (char)mapq;
        // bin patched later (offset 10, u16)
        p[12] = (char)(n_cig & 0xff);
        p[13] = (char)((n_cig >> 8) & 0xff);
        p[14] = (char)(flag & 0xff);
        p[15] = (char)((flag >> 8) & 0xff);
        put_i32(p + 16, (int32_t)l_seq);
        put_i32(p + 20, nrid);
        put_i32(p + 24, (int32_t)pnext0);
        put_i32(p + 28, (int32_t)tlen);
        p += 32;
        memcpy(p, buf + fs[0], l_qname);
        p[l_qname] = 0;
        p += l_qname + 1;
        if (!star_cig) {
            uint32_t num = 0;
            for (long i = fs[5]; i < fe[5]; i++) {
                char c = buf[i];
                if (c >= '0' && c <= '9') { num = num * 10 + (c - '0'); continue; }
                unsigned char op = CIGOP_LUT[(unsigned char)c];
                if (op == 255) return -1;
                put_u32(p, (num << 4) | op);
                p += 4;
                if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
                    rlen += num;
                num = 0;
            }
        }
        int32_t bin = rid >= 0 ? sam_reg2bin(pos0, pos0 + (rlen > 0 ? rlen : 1))
                               : 4680;
        pcig_hdr[10] = (char)(bin & 0xff);
        pcig_hdr[11] = (char)((bin >> 8) & 0xff);
        if (l_seq) {
            const char* s = buf + fs[9];
            for (long i = 0; i + 1 < l_seq; i += 2)
                *p++ = (char)((NT16_LUT[(unsigned char)s[i]] << 4) |
                              NT16_LUT[(unsigned char)s[i + 1]]);
            if (l_seq & 1)
                *p++ = (char)(NT16_LUT[(unsigned char)s[l_seq - 1]] << 4);
            if (fe[10] - fs[10] == 1 && buf[fs[10]] == '*') {
                memset(p, 0xff, l_seq);
                p += l_seq;
            } else {
                const char* q = buf + fs[10];
                for (long i = 0; i < l_seq; i++) {
                    int qv = (unsigned char)q[i] - 33;
                    *p++ = (char)(qv < 0 ? 0 : (qv > 93 ? 93 : qv));
                }
            }
        }
        // tags
        if (nf == 12) {
            long i = tag_start;
            while (i < le) {
                long te = i;
                while (te < le && buf[te] != '\t') te++;
                // NAME:T:VALUE
                if (te - i >= 5 && buf[i + 2] == ':' && buf[i + 4] == ':') {
                    char typ = buf[i + 3];
                    *p++ = buf[i];
                    *p++ = buf[i + 1];
                    long vs = i + 5;
                    if (typ == 'i') {
                        int64_t tv = 0;
                        int neg = 0;
                        for (long k = vs; k < te; k++) {
                            if (buf[k] == '-') { neg = 1; continue; }
                            tv = tv * 10 + (buf[k] - '0');
                        }
                        if (neg) tv = -tv;
                        *p++ = 'i';
                        put_i32(p, (int32_t)tv);
                        p += 4;
                    } else if (typ == 'A') {
                        *p++ = 'A';
                        *p++ = buf[vs];
                    } else if (typ == 'f') {
                        // parse float: integral.frac[eE exp]
                        double dv = 0, frac = 0.1;
                        int neg = 0, in_frac = 0, esign = 1, ev = 0,
                            in_exp = 0;
                        for (long k = vs; k < te; k++) {
                            char c = buf[k];
                            if (c == '-') { if (in_exp) esign = -1; else neg = 1; }
                            else if (c == '+') {}
                            else if (c == '.') in_frac = 1;
                            else if (c == 'e' || c == 'E') { in_exp = 1; in_frac = 0; }
                            else if (in_exp) ev = ev * 10 + (c - '0');
                            else if (in_frac) { dv += (c - '0') * frac; frac *= 0.1; }
                            else dv = dv * 10 + (c - '0');
                        }
                        if (neg) dv = -dv;
                        while (ev-- > 0) dv = esign > 0 ? dv * 10 : dv / 10;
                        float fv = (float)dv;
                        *p++ = 'f';
                        memcpy(p, &fv, 4);
                        p += 4;
                    } else {  // Z, H, and B fall back to Z text copy for
                              // H; B re-encoded below
                        if (typ == 'B' && te > vs) {
                            char sub = buf[vs];
                            *p++ = 'B';
                            *p++ = sub;
                            long cnt = 0;
                            for (long k = vs + 1; k < te; k++)
                                if (buf[k] == ',') cnt++;
                            put_u32(p, (uint32_t)cnt);
                            p += 4;
                            long k = vs + 1;
                            while (k < te) {
                                k++;  // skip comma
                                int64_t tv = 0;
                                int neg = 0;
                                while (k < te && buf[k] != ',') {
                                    if (buf[k] == '-') neg = 1;
                                    else tv = tv * 10 + (buf[k] - '0');
                                    k++;
                                }
                                if (neg) tv = -tv;
                                switch (sub) {
                                    case 'c': case 'C': *p++ = (char)tv; break;
                                    case 's': case 'S':
                                        memcpy(p, &tv, 2); p += 2; break;
                                    default:
                                        put_i32(p, (int32_t)tv); p += 4;
                                }
                            }
                        } else {
                            *p++ = typ == 'H' ? 'H' : 'Z';
                            memcpy(p, buf + vs, te - vs);
                            p += te - vs;
                            *p++ = 0;
                        }
                    }
                }
                i = te + 1;
            }
        }
        int64_t rec_len = p - (p0 + 4);
        put_u32(p0, (uint32_t)rec_len);
        rec_off[r] = w;
        rid_out[r] = rid;
        pos_out[r] = pos0;
        rlen_out[r] = (int32_t)(rlen > 0 ? rlen : 1);
        w += 4 + rec_len;
    }
    rec_off[n_recs] = w;
    return w;
}

}  // extern "C"

// --------------------------------------------------------------------------
// Parallel BGZF compression (the capability of the reference's missing
// htslib extensions bam_write_idx2/bgzf_flush2, sortmardup/main.cpp:406:
// shards compress into independent gzip members that concatenate into a
// valid BGZF stream). Blocks are compressed by a pthread pool directly
// into fixed-stride slots of the output buffer, then compacted.
// --------------------------------------------------------------------------

#include <pthread.h>
#include <zlib.h>
#include <cstdlib>

namespace {

struct BgzfJob {
    const char* data;
    int64_t n;
    int level;
    int64_t n_blocks;
    int64_t stride;
    char* slots;
    int32_t* sizes;         // compressed block size (full member) per block
    int64_t next;           // atomic cursor
    pthread_mutex_t lock;
};

const int64_t BGZF_MAX_BLOCK = 0xFF00;

int compress_one(const char* src, int64_t ulen, int level, char* dst,
                 int64_t cap) {
    // header(18) + raw deflate + crc32 + isize
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK)
        return -1;
    zs.next_in = (Bytef*)src;
    zs.avail_in = (uInt)ulen;
    zs.next_out = (Bytef*)(dst + 18);
    zs.avail_out = (uInt)(cap - 26);
    int ret = deflate(&zs, Z_FINISH);
    int64_t clen = (int64_t)zs.total_out;
    deflateEnd(&zs);
    if (ret != Z_STREAM_END)
        return -1;
    int64_t bsize = clen + 18 + 8;
    if (bsize > 0x10000)
        return -1;
    unsigned char hdr[18] = {0x1f, 0x8b, 8, 4, 0, 0, 0, 0, 0, 0xff,
                             6, 0, 66, 67, 2, 0, 0, 0};
    uint16_t bs16 = (uint16_t)(bsize - 1);
    memcpy(hdr + 16, &bs16, 2);
    memcpy(dst, hdr, 18);
    uint32_t crc = crc32(0L, Z_NULL, 0);
    crc = crc32(crc, (const Bytef*)src, (uInt)ulen);
    uint32_t isz = (uint32_t)ulen;
    memcpy(dst + 18 + clen, &crc, 4);
    memcpy(dst + 18 + clen + 4, &isz, 4);
    return (int)bsize;
}

void* bgzf_worker(void* arg) {
    BgzfJob* job = (BgzfJob*)arg;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        int64_t b = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (b >= job->n_blocks)
            return nullptr;
        int64_t ustart = b * BGZF_MAX_BLOCK;
        int64_t ulen = job->n - ustart;
        if (ulen > BGZF_MAX_BLOCK) ulen = BGZF_MAX_BLOCK;
        int sz = compress_one(job->data + ustart, ulen, job->level,
                              job->slots + b * job->stride, job->stride);
        job->sizes[b] = sz;
    }
}

}  // namespace

extern "C" {

// Compress data into a BGZF stream with nthreads workers. out must hold
// n_blocks * stride bytes where stride >= 0x10000 + 64. Returns total
// compressed bytes (blocks compacted at the front of out), and fills
// coffsets[n_blocks+1] with compressed block start offsets. -1 on error.
int64_t bgzf_compress_parallel(const char* data, int64_t n, int level,
                               int nthreads, char* out, int64_t stride,
                               int64_t* coffsets) {
    int64_t n_blocks = n > 0 ? (n + BGZF_MAX_BLOCK - 1) / BGZF_MAX_BLOCK : 1;
    BgzfJob job;
    job.data = data;
    job.n = n;
    job.level = level;
    job.n_blocks = n_blocks;
    job.stride = stride;
    job.slots = out;
    job.sizes = (int32_t*)malloc(n_blocks * sizeof(int32_t));
    job.next = 0;
    pthread_mutex_init(&job.lock, nullptr);
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 64) nthreads = 64;
    pthread_t tids[64];
    int nt = (int)(nthreads < n_blocks ? nthreads : n_blocks);
    for (int t = 0; t < nt; t++)
        pthread_create(&tids[t], nullptr, bgzf_worker, &job);
    for (int t = 0; t < nt; t++)
        pthread_join(tids[t], nullptr);
    pthread_mutex_destroy(&job.lock);
    // compact
    int64_t w = 0;
    for (int64_t b = 0; b < n_blocks; b++) {
        if (job.sizes[b] < 0) { free(job.sizes); return -1; }
        coffsets[b] = w;
        memmove(out + w, out + b * stride, job.sizes[b]);
        w += job.sizes[b];
    }
    coffsets[n_blocks] = w;
    free(job.sizes);
    return w;
}

}  // extern "C"

// ----------------------------------------------------------------------
// SA-IS linear-time suffix array (Nong/Zhang/Chan induced sorting).
// Plays the role of the reference's BWT-SW index construction
// (bwa-mem2-lcp src/bwtindex.cpp:197, bwt_bwtgen2) at WGS scale, where
// the Python prefix-doubling builder's O(n log^2 n) sorts stop being
// practical. Written from the published algorithm; validated against
// the Python builder lane-for-lane in tests.
// ----------------------------------------------------------------------

#include <vector>

namespace sais {

static inline bool is_lms(const std::vector<bool>& st, int64_t i) {
    return i > 0 && st[i] && !st[i - 1];
}

template <typename T>
static void buckets(const T* s, int64_t n, int64_t K,
                    std::vector<int64_t>& bkt, bool ends) {
    std::fill(bkt.begin(), bkt.end(), 0);
    for (int64_t i = 0; i < n; i++) bkt[s[i]]++;
    int64_t sum = 0;
    for (int64_t c = 0; c < K; c++) {
        sum += bkt[c];
        bkt[c] = ends ? sum : sum - bkt[c];
    }
}

template <typename T>
static void induce(const T* s, int64_t* SA, int64_t n, int64_t K,
                   const std::vector<bool>& st,
                   std::vector<int64_t>& bkt) {
    // L from bucket heads
    buckets(s, n, K, bkt, false);
    for (int64_t i = 0; i < n; i++) {
        int64_t j = SA[i] - 1;
        if (SA[i] > 0 && !st[j]) SA[bkt[s[j]]++] = j;
    }
    // S from bucket ends
    buckets(s, n, K, bkt, true);
    for (int64_t i = n - 1; i >= 0; i--) {
        int64_t j = SA[i] - 1;
        if (SA[i] > 0 && st[j]) SA[--bkt[s[j]]] = j;
    }
}

// s[n-1] must be the unique smallest symbol (sentinel).
template <typename T>
static void core(const T* s, int64_t* SA, int64_t n, int64_t K) {
    if (n == 1) { SA[0] = 0; return; }
    std::vector<bool> st(n);
    st[n - 1] = true;
    for (int64_t i = n - 2; i >= 0; i--)
        st[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && st[i + 1]);
    std::vector<int64_t> bkt(K);

    // pass 1: place LMS suffixes arbitrarily, induce to sort LMS substrings
    std::fill(SA, SA + n, -1);
    buckets(s, n, K, bkt, true);
    for (int64_t i = 1; i < n; i++)
        if (is_lms(st, i)) SA[--bkt[s[i]]] = i;
    induce(s, SA, n, K, st, bkt);

    // compact sorted LMS suffixes
    int64_t n1 = 0;
    for (int64_t i = 0; i < n; i++)
        if (is_lms(st, SA[i])) SA[n1++] = SA[i];

    // name LMS substrings
    int64_t* s1 = SA + n1;               // reuse tail of SA for names
    std::fill(s1, SA + n, -1);
    int64_t name = 0, prev = -1;
    for (int64_t i = 0; i < n1; i++) {
        int64_t pos = SA[i];
        bool diff = false;
        if (prev == -1) diff = true;
        else {
            for (int64_t d = 0;; d++) {
                if (s[pos + d] != s[prev + d] ||
                    st[pos + d] != st[prev + d]) { diff = true; break; }
                if (d > 0 && (is_lms(st, pos + d) || is_lms(st, prev + d)))
                    break;               // both LMS ends, equal substring
            }
        }
        if (diff) { name++; prev = pos; }
        s1[pos / 2] = name - 1;
    }
    // compact names into a dense reduced string (in LMS text order)
    int64_t m = 0;
    for (int64_t i = 0; i < n - n1; i++)
        if (s1[i] >= 0) s1[m++] = s1[i];

    if (name < n1) {                     // names not unique: recurse
        core(s1, SA, n1, name);
    } else {
        for (int64_t i = 0; i < n1; i++) SA[s1[i]] = i;
    }
    // map reduced SA back to LMS positions (text order list of LMS)
    std::vector<int64_t> lms(n1);
    {
        int64_t j = 0;
        for (int64_t i = 1; i < n; i++)
            if (is_lms(st, i)) lms[j++] = i;
    }
    for (int64_t i = 0; i < n1; i++) SA[i] = lms[SA[i]];

    // pass 2: place sorted LMS at bucket ends, induce final SA
    std::fill(SA + n1, SA + n, -1);
    buckets(s, n, K, bkt, true);
    for (int64_t i = n1 - 1; i >= 0; i--) {
        int64_t j = SA[i];
        SA[i] = -1;
        SA[--bkt[s[j]]] = j;
    }
    induce(s, SA, n, K, st, bkt);
}

}  // namespace sais

extern "C" int64_t suffix_array_u8(const uint8_t* s, int64_t n,
                                   int64_t* sa_out) {
    // SA of s under virtual-terminator comparison (terminator smallest):
    // run SA-IS on s+1 with a 0 sentinel appended, drop the sentinel row.
    if (n <= 0) return 0;
    std::vector<int32_t> t(n + 1);
    int64_t K = 0;
    for (int64_t i = 0; i < n; i++) {
        t[i] = (int32_t)s[i] + 1;
        if (t[i] >= K) K = t[i] + 1;
    }
    t[n] = 0;
    std::vector<int64_t> SA(n + 1);
    sais::core(t.data(), SA.data(), n + 1, K);
    for (int64_t i = 1; i <= n; i++) sa_out[i - 1] = SA[i];
    return n;
}

// ----------------------------------------------------------------------
// Batched banded global alignment with traceback (ksw_global2 semantics).
//
// Bit-for-bit transcription of the framework's Python oracle
// (fgdp_tpu/align/finalize.py ksw_global, itself transcribing the
// reference src/ksw.cpp ksw_global2): same z direction bits
// (f<<5 | e<<2 | h), same tie-breaks, same backtrack. The Python numpy
// batch computed every padded column; this computes only the band and
// fans jobs out over a pthread pool — the reg2aln CIGAR DP was the
// dominant host finalize cost (VERDICT round 1 item 3b).

namespace kswg {

const int32_t KMINUS_INF = -0x40000000;

struct Batch {
    const uint8_t* queries;   // [N, QM]
    const uint8_t* targets;   // [N, TM]
    const int32_t* qlens;
    const int32_t* tlens;
    const int32_t* ws;
    int64_t N, QM, TM;
    const int8_t* mat;        // 5x5
    int o_del, e_del, o_ins, e_ins;
    int32_t* scores;          // [N]
    int32_t* cigars;          // [N, 2*max_cig] (op,len) pairs
    int32_t* n_cigar;         // [N]; -1 = cigar overflow
    int64_t max_cig;
    int64_t next;             // atomic cursor
    pthread_mutex_t lock;
};

static void push_op(int32_t* cig, int32_t* n, int64_t cap, int op,
                    int32_t len) {
    if (*n > 0 && cig[2 * (*n - 1)] == op) {
        cig[2 * (*n - 1) + 1] += len;
    } else if (*n < cap) {
        cig[2 * *n] = op;
        cig[2 * *n + 1] = len;
        (*n)++;
    } else {
        *n = -1;  // overflow — caller falls back
    }
}

static void align_one(Batch* B, int64_t j0, int32_t* eh_h, int32_t* eh_e,
                      uint8_t* z) {
    const uint8_t* query = B->queries + j0 * B->QM;
    const uint8_t* target = B->targets + j0 * B->TM;
    int qlen = B->qlens[j0], tlen = B->tlens[j0], w = B->ws[j0];
    int o_del = B->o_del, e_del = B->e_del;
    int o_ins = B->o_ins, e_ins = B->e_ins;
    int oe_del = o_del + e_del, oe_ins = o_ins + e_ins;
    int n_col = qlen < 2 * w + 1 ? qlen : 2 * w + 1;

    for (int j = 0; j <= qlen + 1; j++) {
        eh_h[j] = KMINUS_INF;
        eh_e[j] = KMINUS_INF;
    }
    eh_h[0] = 0;
    for (int j = 1; j <= qlen && j <= w; j++)
        eh_h[j] = -(o_ins + e_ins * j);

    for (int i = 0; i < tlen; i++) {
        int beg = i - w > 0 ? i - w : 0;
        int end = i + w + 1 < qlen ? i + w + 1 : qlen;
        if (beg >= end) continue;
        // h1 = H(i, j-1) running value; at j=beg the left boundary
        int32_t h1 = beg == 0 ? -(o_del + e_del * (i + 1)) : KMINUS_INF;
        const int8_t* qp = B->mat + 5 * target[i];
        int32_t f = KMINUS_INF;
        uint8_t* zr = z + (int64_t)i * n_col;
        for (int j = beg; j < end; j++) {
            // shifted storage: eh_h[j] = H(i-1, j-1), eh_e[j] = E(i, j)
            int32_t m = eh_h[j] + qp[query[j]];
            int32_t e = eh_e[j];
            eh_h[j] = h1;                       // becomes H(i, j-1)
            uint8_t d = m < e ? 1 : 0;
            int32_t h = m >= e ? m : e;
            d = h >= f ? d : 2;
            int32_t H = h >= f ? h : f;
            d |= (uint8_t)(e - e_del > m - oe_del) << 2;
            d |= (uint8_t)(f - e_ins > m - oe_ins) << 5;
            zr[j - beg] = d;
            int32_t e2 = m - oe_del;
            int32_t e3 = e - e_del;
            eh_e[j] = e2 > e3 ? e2 : e3;
            int32_t f2 = f - e_ins;
            int32_t f3 = m - oe_ins;
            f = f2 > f3 ? f2 : f3;
            h1 = H;
        }
        eh_h[end] = h1;
        eh_e[end] = KMINUS_INF;
    }
    B->scores[j0] = eh_h[qlen];

    // backtrack (ksw.cpp:196-211): which 0=M 1=D(from E) 2/3=I(from F)
    int32_t* cig = B->cigars + j0 * 2 * B->max_cig;
    int32_t nc = 0;
    int i = tlen - 1;
    int k = (i + w + 1 < qlen ? i + w + 1 : qlen) - 1;
    int which = 0;
    // ops pushed in reverse; collected then reversed at the end
    int32_t* rev_ops = (int32_t*)malloc(
        (size_t)(qlen + tlen + 2) * sizeof(int32_t));
    int nrev = 0;
    while (i >= 0 && k >= 0) {
        int beg = i - w > 0 ? i - w : 0;
        which = (z[(int64_t)i * n_col + (k - beg)] >> (which << 1)) & 3;
        if (which == 0) { rev_ops[nrev++] = 0; i--; k--; }
        else if (which == 1) { rev_ops[nrev++] = 2; i--; }
        else { rev_ops[nrev++] = 1; k--; }
    }
    if (i >= 0) push_op(cig, &nc, B->max_cig, 2, i + 1);
    if (k >= 0) push_op(cig, &nc, B->max_cig, 1, k + 1);
    for (int r = nrev - 1; r >= 0 && nc >= 0; r--)
        push_op(cig, &nc, B->max_cig, rev_ops[r], 1);
    free(rev_ops);
    B->n_cigar[j0] = nc;
}

static void* worker(void* arg) {
    Batch* B = (Batch*)arg;
    // per-thread scratch sized to the batch maxima
    int32_t* eh_h = (int32_t*)malloc((size_t)(B->QM + 2) * sizeof(int32_t));
    int32_t* eh_e = (int32_t*)malloc((size_t)(B->QM + 2) * sizeof(int32_t));
    uint8_t* z = (uint8_t*)malloc((size_t)B->TM * B->QM);
    for (;;) {
        pthread_mutex_lock(&B->lock);
        int64_t j = B->next++;
        pthread_mutex_unlock(&B->lock);
        if (j >= B->N) break;
        if (B->qlens[j] <= 0 || B->tlens[j] <= 0) {
            B->scores[j] = KMINUS_INF;
            B->n_cigar[j] = 0;
            continue;
        }
        align_one(B, j, eh_h, eh_e, z);
    }
    free(eh_h); free(eh_e); free(z);
    return nullptr;
}

}  // namespace kswg

extern "C" {

// Batched banded global alignment. queries/targets: uint8 [N,QM]/[N,TM]
// row-major (codes 0..4); cigars: int32 [N, 2*max_cig] (op,len) pairs,
// op in {0:M, 1:I, 2:D}; n_cigar[j] = -1 flags cigar-capacity overflow
// (caller falls back to the Python path for that job). Returns 0.
int ksw_global_batch_native(
        const uint8_t* queries, const uint8_t* targets,
        const int32_t* qlens, const int32_t* tlens, const int32_t* ws,
        int64_t N, int64_t QM, int64_t TM, const int8_t* mat,
        int o_del, int e_del, int o_ins, int e_ins, int nthreads,
        int32_t* scores, int32_t* cigars, int32_t* n_cigar,
        int64_t max_cig) {
    kswg::Batch B;
    B.queries = queries; B.targets = targets;
    B.qlens = qlens; B.tlens = tlens; B.ws = ws;
    B.N = N; B.QM = QM; B.TM = TM;
    B.mat = mat;
    B.o_del = o_del; B.e_del = e_del; B.o_ins = o_ins; B.e_ins = e_ins;
    B.scores = scores; B.cigars = cigars; B.n_cigar = n_cigar;
    B.max_cig = max_cig;
    B.next = 0;
    pthread_mutex_init(&B.lock, nullptr);
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 64) nthreads = 64;
    int nt = (int)(nthreads < N ? nthreads : N);
    if (nt < 1) nt = 1;
    pthread_t tids[64];
    for (int t = 0; t < nt; t++)
        pthread_create(&tids[t], nullptr, kswg::worker, &B);
    for (int t = 0; t < nt; t++)
        pthread_join(tids[t], nullptr);
    pthread_mutex_destroy(&B.lock);
    return 0;
}

// ----------------------------------------------------------------------
// LCP-interval tree arrays for single-pass SMEM enumeration (the LISA
// lcpi/lcpp1 role, ext/TAL/src/LISA-FMI/LISA_search.h:265-333 — own
// construction: Kasai LCP + monotonic-stack prev/next-strictly-smaller).
//
// Inputs: text x (uint8[xlen], codes 0..3) and its full suffix array
// sa (int32[nrows], nrows = xlen + 1, sa[0] = xlen = sentinel suffix;
// suffix order with the sentinel smallest).
// Outputs, one entry per SA BOUNDARY b in [0, nrows] (boundary b sits
// between rows b-1 and b):
//   lcp[b]   = LCP(suffix at row b-1, suffix at row b); -1 at b=0,nrows
//   left[b]  = max j <  b with lcp[j] < lcp[b]   (interval left end)
//   right[b] = min j >  b with lcp[j] < lcp[b]   (interval right end)
// [left[b], right[b]) is the smallest lcp-interval strictly containing
// boundary b; its depth is lcp[b].
// ----------------------------------------------------------------------

extern "C" int lcp_tree_arrays(const uint8_t* x, int64_t xlen,
                               const int32_t* sa, int64_t nrows,
                               int32_t* lcp, int32_t* left,
                               int32_t* right) {
    if (nrows != xlen + 1) return -1;
    std::vector<int32_t> rank(nrows);
    for (int64_t r = 0; r < nrows; r++) {
        int32_t p = sa[r];
        if (p < 0 || p > xlen) return -2;
        rank[p] = (int32_t)r;
    }
    // Kasai over suffixes (virtual terminator past xlen, smallest)
    int64_t h = 0;
    for (int64_t i = 0; i <= xlen; i++) {
        int32_t r = rank[i];
        if (r == 0) { h = 0; continue; }
        int64_t j = sa[r - 1];
        while (i + h < xlen && j + h < xlen && x[i + h] == x[j + h]) h++;
        lcp[r] = (int32_t)h;
        if (h > 0) h--;
    }
    lcp[0] = -1;
    lcp[nrows] = -1;
    // prev / next strictly-smaller via monotonic stacks
    {
        std::vector<int64_t> st;
        st.reserve(1 << 16);
        for (int64_t b = 0; b <= nrows; b++) {
            while (!st.empty() && lcp[st.back()] >= lcp[b]) st.pop_back();
            left[b] = st.empty() ? 0 : (int32_t)st.back();
            st.push_back(b);
        }
        st.clear();
        for (int64_t b = nrows; b >= 0; b--) {
            while (!st.empty() && lcp[st.back()] >= lcp[b]) st.pop_back();
            right[b] = st.empty() ? (int32_t)nrows : (int32_t)st.back();
            st.push_back(b);
        }
    }
    return 0;
}

}  // extern "C"

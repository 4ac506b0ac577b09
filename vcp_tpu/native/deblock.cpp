// Host-side H.264 in-loop deblocking (spec 8.7), scalar raster order.
//
// Native counterpart of ops/deblock.deblock_frame_host for the
// validation decoder: the spec's filter order is sequential per-MB
// (vertical edges then horizontal, each edge reading previously
// filtered samples), which is exactly a scalar double loop on the host.
// Threshold grids (bS/alpha/beta/tc0 per edge position) are prepared in
// Python from the same helpers the device wavefront uses, so all three
// engines stay bit-identical (asserted by tests/test_deblock.py).
//
// C ABI, loaded via ctypes.

#include <cstdint>
#include <cstdlib>

namespace {

inline int32_t clip3(int32_t lo, int32_t hi, int32_t v) {
    return v < lo ? lo : (v > hi ? hi : v);
}

inline int32_t clip1(int32_t v) { return clip3(0, 255, v); }

// One luma edge line: p/q are strided sample pointers (stride = step
// between p0 and p1 etc., i.e. -1 column/row direction handled by sign).
inline void filter_luma_line(int32_t* s, int step, int32_t bs, int32_t al,
                             int32_t be, int32_t tc0) {
    // s points at q0; p_i = s[-(i+1)*step], q_i = s[i*step]
    int32_t q0 = s[0], q1 = s[step], q2 = s[2 * step], q3 = s[3 * step];
    int32_t p0 = s[-step], p1 = s[-2 * step], p2 = s[-3 * step],
            p3 = s[-4 * step];
    if (bs == 0) return;
    if (abs(p0 - q0) >= al || abs(p1 - p0) >= be || abs(q1 - q0) >= be)
        return;
    bool ap = abs(p2 - p0) < be;
    bool aq = abs(q2 - q0) < be;
    if (bs == 4) {
        bool strong = abs(p0 - q0) < ((al >> 2) + 2);
        if (ap && strong) {
            s[-step] = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3;
            s[-2 * step] = (p2 + p1 + p0 + q0 + 2) >> 2;
            s[-3 * step] = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3;
        } else {
            s[-step] = (2 * p1 + p0 + q1 + 2) >> 2;
        }
        if (aq && strong) {
            s[0] = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3;
            s[step] = (q2 + q1 + q0 + p0 + 2) >> 2;
            s[2 * step] = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3;
        } else {
            s[0] = (2 * q1 + q0 + p1 + 2) >> 2;
        }
        return;
    }
    int32_t tc = tc0 + (ap ? 1 : 0) + (aq ? 1 : 0);
    int32_t delta = clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3);
    s[-step] = clip1(p0 + delta);
    s[0] = clip1(q0 - delta);
    if (ap)
        s[-2 * step] = p1 + clip3(-tc0, tc0,
                                  (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1);
    if (aq)
        s[step] = q1 + clip3(-tc0, tc0,
                             (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1);
}

inline void filter_chroma_line(int32_t* s, int step, int32_t bs,
                               int32_t al, int32_t be, int32_t tc0) {
    int32_t q0 = s[0], q1 = s[step];
    int32_t p0 = s[-step], p1 = s[-2 * step];
    if (bs == 0) return;
    if (abs(p0 - q0) >= al || abs(p1 - p0) >= be || abs(q1 - q0) >= be)
        return;
    if (bs == 4) {
        s[-step] = (2 * p1 + p0 + q1 + 2) >> 2;
        s[0] = (2 * q1 + q0 + p1 + 2) >> 2;
        return;
    }
    int32_t tc = tc0 + 1;
    int32_t delta = clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3);
    s[-step] = clip1(p0 + delta);
    s[0] = clip1(q0 - delta);
}

}  // namespace

extern "C" {

// Planes modified in place. Threshold grids: vthr (4, h, w/4) indexed
// [t][row*w/4 + m] for the vertical edge AT column 4m (m=0 carries bS 0);
// hthr (4, h/4, w) for the horizontal edge AT row 4m; chroma grids
// likewise at half resolution with 8-px MBs.
void vcp_deblock_frame(int32_t* y, int32_t* u, int32_t* v,
                       int h, int w,
                       const int32_t* vthr, const int32_t* hthr,
                       const int32_t* cvthr, const int32_t* chthr) {
    const int n_mby = h / 16, n_mbx = w / 16;
    const int wv = w / 4;                  // vthr row stride
    const int hc = h / 2, wc = w / 2;
    const int wcv = wc / 4;
    const int64_t vsz = (int64_t)h * wv;
    const int64_t hsz = (int64_t)(h / 4) * w;
    const int64_t cvsz = (int64_t)hc * wcv;
    const int64_t chsz = (int64_t)(hc / 4) * wc;

    for (int mby = 0; mby < n_mby; mby++) {
        for (int mbx = 0; mbx < n_mbx; mbx++) {
            // --- vertical luma edges, left to right
            for (int k = 0; k < 4; k++) {
                int c = 16 * mbx + 4 * k;
                if (c == 0) continue;
                int m = c / 4;
                for (int r = 16 * mby; r < 16 * mby + 16; r++) {
                    int32_t bs = vthr[(int64_t)r * wv + m];
                    if (!bs) continue;
                    filter_luma_line(
                        y + (int64_t)r * w + c, 1, bs,
                        vthr[vsz + (int64_t)r * wv + m],
                        vthr[2 * vsz + (int64_t)r * wv + m],
                        vthr[3 * vsz + (int64_t)r * wv + m]);
                }
            }
            // --- horizontal luma edges, top to bottom
            for (int k = 0; k < 4; k++) {
                int r = 16 * mby + 4 * k;
                if (r == 0) continue;
                int m = r / 4;
                for (int c = 16 * mbx; c < 16 * mbx + 16; c++) {
                    int32_t bs = hthr[(int64_t)m * w + c];
                    if (!bs) continue;
                    filter_luma_line(
                        y + (int64_t)r * w + c, w, bs,
                        hthr[hsz + (int64_t)m * w + c],
                        hthr[2 * hsz + (int64_t)m * w + c],
                        hthr[3 * hsz + (int64_t)m * w + c]);
                }
            }
            // --- chroma edges (8-px MBs, both planes)
            for (int k = 0; k < 2; k++) {
                int c = 8 * mbx + 4 * k;
                if (c == 0) continue;
                int m = c / 4;
                for (int r = 8 * mby; r < 8 * mby + 8; r++) {
                    int32_t bs = cvthr[(int64_t)r * wcv + m];
                    if (!bs) continue;
                    int32_t al = cvthr[cvsz + (int64_t)r * wcv + m];
                    int32_t be = cvthr[2 * cvsz + (int64_t)r * wcv + m];
                    int32_t tc = cvthr[3 * cvsz + (int64_t)r * wcv + m];
                    filter_chroma_line(u + (int64_t)r * wc + c, 1, bs,
                                       al, be, tc);
                    filter_chroma_line(v + (int64_t)r * wc + c, 1, bs,
                                       al, be, tc);
                }
            }
            for (int k = 0; k < 2; k++) {
                int r = 8 * mby + 4 * k;
                if (r == 0) continue;
                int m = r / 4;
                for (int c = 8 * mbx; c < 8 * mbx + 8; c++) {
                    int32_t bs = chthr[(int64_t)m * wc + c];
                    if (!bs) continue;
                    int32_t al = chthr[chsz + (int64_t)m * wc + c];
                    int32_t be = chthr[2 * chsz + (int64_t)m * wc + c];
                    int32_t tc = chthr[3 * chsz + (int64_t)m * wc + c];
                    filter_chroma_line(u + (int64_t)r * wc + c, wc, bs,
                                       al, be, tc);
                    filter_chroma_line(v + (int64_t)r * wc + c, wc, bs,
                                       al, be, tc);
                }
            }
        }
    }
}

}  // extern "C"

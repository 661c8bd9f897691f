// tpudf host-side video frame sampler (libavformat/libavcodec/libswscale).
//
// The reference samples video on the host with cv2: a stride-histogram
// scene scan over the whole file plus per-index seek+decode
// (appv3.py:611-786, hidf_video_classifier.py:106-149). cv2's
// CAP_PROP_POS_FRAMES seeks re-decode a GOP per sampled frame; this native
// sampler instead makes ONE multithreaded sequential decode pass for the
// scan (histogramming every stride-th frame from a 64x64 gray downscale)
// and one for frame extraction, converting only the picked frames to
// size x size RGB24 (SWS_AREA). The pick logic (primary scene + adaptive
// indices) follows tpudf/data/video.py, with two deliberate approximations:
// the scan histograms a 64x64 GRAY8 downscale (the Python fallback uses the
// full-resolution luma), and stable_sort tie order can differ from
// np.argsort — so clips with inter-frame differences right at cut_thresh
// may pick different (equally valid) frames than the fallback. Python
// binding: ctypes (tpudf/data/video_native.py).
//
// Exposed C API:
//   tpudf_sample_video(path, max_samples, stride, cut_thresh, size,
//                      scene_aware, out, out_idx) -> n_decoded (<0 = error)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <set>
#include <vector>

namespace {

constexpr int kHistBins = 64;
constexpr int kScanSize = 64;  // gray downscale for the histogram scan

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  int stream = -1;

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* dec = nullptr;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (stream < 0 || !dec) return -2;
    ctx = avcodec_alloc_context3(dec);
    if (!ctx) return -3;
    if (avcodec_parameters_to_context(ctx, fmt->streams[stream]->codecpar) <
        0)
      return -3;
    ctx->thread_count = 0;  // auto
    ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (avcodec_open2(ctx, dec, nullptr) < 0) return -3;
    return 0;
  }

  // Rewind to the start for a second sequential pass.
  int rewind() {
    if (av_seek_frame(fmt, stream, 0,
                      AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE) < 0 &&
        av_seek_frame(fmt, stream, 0, AVSEEK_FLAG_BACKWARD) < 0)
      return -4;
    avcodec_flush_buffers(ctx);
    return 0;
  }

  ~Reader() {
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
  }
};

// Sequential decode; calls on_frame(display_index, frame) for every frame.
template <typename F>
int for_each_frame(Reader& r, F&& on_frame) {
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  if (!pkt || !frm) return -3;
  int idx = 0;
  bool eof = false;
  while (!eof) {
    int rr = av_read_frame(r.fmt, pkt);
    if (rr < 0) {
      eof = true;
      avcodec_send_packet(r.ctx, nullptr);  // drain
    } else if (pkt->stream_index != r.stream) {
      av_packet_unref(pkt);
      continue;
    } else {
      avcodec_send_packet(r.ctx, pkt);
      av_packet_unref(pkt);
    }
    for (;;) {
      int rc = avcodec_receive_frame(r.ctx, frm);
      if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
      if (rc < 0) {
        av_frame_free(&frm);
        av_packet_free(&pkt);
        return -3;
      }
      if (!on_frame(idx, frm)) {
        av_frame_free(&frm);
        av_packet_free(&pkt);
        return idx + 1;
      }
      ++idx;
    }
  }
  av_frame_free(&frm);
  av_packet_free(&pkt);
  return idx;
}

// L1-normalized Bhattacharyya distance, matching data/video.py.
double bhattacharyya(const double* p, const double* q) {
  double ps = 0, qs = 0;
  for (int i = 0; i < kHistBins; ++i) {
    ps += p[i];
    qs += q[i];
  }
  double bc = 0;
  for (int i = 0; i < kHistBins; ++i)
    bc += std::sqrt((p[i] / (ps + 1e-12)) * (q[i] / (qs + 1e-12)));
  double v = 1.0 - bc;
  return std::sqrt(v > 0 ? v : 0.0);
}

// Longest run between scene cuts (data/video.py pick_primary_scene).
void primary_scene(const std::vector<int>& indices,
                   const std::vector<double>& diffs, float cut_thresh,
                   int* lo_idx, int* hi_idx) {
  std::vector<int> cuts{0};
  for (size_t i = 0; i < diffs.size(); ++i)
    if (diffs[i] > cut_thresh) cuts.push_back(static_cast<int>(i));
  cuts.push_back(static_cast<int>(indices.size()));
  int best_lo = 0, best_hi = static_cast<int>(indices.size()), best_len = -1;
  for (size_t k = 0; k + 1 < cuts.size(); ++k) {
    if (cuts[k + 1] - cuts[k] > best_len) {
      best_len = cuts[k + 1] - cuts[k];
      best_lo = cuts[k];
      best_hi = cuts[k + 1];
    }
  }
  *lo_idx = indices[best_lo];
  *hi_idx = indices[std::min<size_t>(best_hi, indices.size()) - 1];
}

// Uniform base + top-change candidates (data/video.py
// adaptive_sample_indices; np.linspace(...).round() = round-half-even).
std::vector<int> adaptive_pick(const std::vector<int>& indices,
                               const std::vector<double>& diffs,
                               int max_samples, int min_gap) {
  const int n = static_cast<int>(indices.size());
  if (n == 0) return {};
  if (n <= max_samples) return indices;
  const int base_k = std::max(max_samples / 2, 1);
  std::vector<int> chosen;
  for (int i = 0; i < base_k; ++i) {
    double t = base_k == 1 ? 0.0
                           : static_cast<double>(i) * (n - 1) / (base_k - 1);
    double r = std::nearbyint(t);  // round-half-even, like np.round
    chosen.push_back(indices[static_cast<int>(r)]);
  }
  std::vector<int> order(diffs.size());
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return diffs[a] > diffs[b]; });
  for (int j : order) {
    if (static_cast<int>(chosen.size()) >= max_samples) break;
    int cand = indices[j];
    bool ok = true;
    for (int c : chosen)
      if (std::abs(cand - c) < min_gap) {
        ok = false;
        break;
      }
    if (ok) chosen.push_back(cand);
  }
  std::set<int> uniq(chosen.begin(), chosen.end());
  std::vector<int> out(uniq.begin(), uniq.end());
  if (static_cast<int>(out.size()) > max_samples) out.resize(max_samples);
  return out;
}

std::vector<int> uniform_pick(int total, int max_samples) {
  std::set<int> uniq;
  const int k = std::min(max_samples, total);
  for (int i = 0; i < k; ++i) {
    double t = k == 1 ? 0.0 : static_cast<double>(i) * (total - 1) / (k - 1);
    uniq.insert(static_cast<int>(t));  // np .astype(int) truncates
  }
  return std::vector<int>(uniq.begin(), uniq.end());
}

}  // namespace

extern "C" {

// Scan + pick + decode. out: max_samples*size*size*3 u8 (RGB, HWC);
// out_idx: max_samples ints. Returns number of frames written (<0 = error:
// -1 open, -2 no video stream, -3 decode, -4 seek).
int tpudf_sample_video(const char* path, int max_samples, int stride,
                       float cut_thresh, int size, int scene_aware,
                       uint8_t* out, int* out_idx) {
  av_log_set_level(AV_LOG_ERROR);
  Reader r;
  int rc = r.open(path);
  if (rc < 0) return rc;
  stride = stride > 0 ? stride : 1;

  // ---- pass 1: sequential scan — count frames, histogram every stride-th
  std::vector<int> kept;
  std::vector<std::vector<double>> hists;
  SwsContext* gray_sws = nullptr;
  std::vector<uint8_t> gray(static_cast<size_t>(kScanSize) * kScanSize);
  int total = for_each_frame(r, [&](int idx, AVFrame* f) {
    if (idx % stride != 0) return true;
    gray_sws = sws_getCachedContext(
        gray_sws, f->width, f->height, static_cast<AVPixelFormat>(f->format),
        kScanSize, kScanSize, AV_PIX_FMT_GRAY8, SWS_AREA, nullptr, nullptr,
        nullptr);
    if (!gray_sws) return true;
    uint8_t* dst[1] = {gray.data()};
    int dst_stride[1] = {kScanSize};
    sws_scale(gray_sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
    std::vector<double> h(kHistBins, 0.0);
    for (uint8_t v : gray) h[v * kHistBins / 256] += 1.0;
    hists.push_back(std::move(h));
    kept.push_back(idx);
    return true;
  });
  if (gray_sws) sws_freeContext(gray_sws);
  if (total <= 0) return total == 0 ? 0 : total;

  // ---- pick indices (mirrors data/video.py sample_video)
  std::vector<int> picks;
  if (scene_aware && total > max_samples * stride && !kept.empty()) {
    std::vector<double> diffs{0.0};
    for (size_t i = 1; i < hists.size(); ++i)
      diffs.push_back(bhattacharyya(hists[i - 1].data(), hists[i].data()));
    int lo, hi;
    primary_scene(kept, diffs, cut_thresh, &lo, &hi);
    std::vector<int> scoped_idx;
    std::vector<double> scoped_diff;
    for (size_t i = 0; i < kept.size(); ++i)
      if (kept[i] >= lo && kept[i] <= hi) {
        scoped_idx.push_back(kept[i]);
        scoped_diff.push_back(diffs[i]);
      }
    if (!scoped_idx.empty())
      picks = adaptive_pick(scoped_idx, scoped_diff, max_samples,
                            std::max(stride, 2));
    else
      picks = adaptive_pick(kept, diffs, max_samples, std::max(stride, 2));
  }
  if (picks.empty()) picks = uniform_pick(total, max_samples);

  // ---- pass 2: sequential decode, convert only the picked frames
  if (r.rewind() < 0) return -4;
  SwsContext* rgb_sws = nullptr;
  const size_t fstride = static_cast<size_t>(size) * size * 3;
  size_t next = 0;
  int written = 0;
  int rc2 = for_each_frame(r, [&](int idx, AVFrame* f) {
    while (next < picks.size() && picks[next] < idx) ++next;  // missed
    if (next >= picks.size()) return false;                   // done
    if (picks[next] != idx) return true;
    rgb_sws = sws_getCachedContext(
        rgb_sws, f->width, f->height, static_cast<AVPixelFormat>(f->format),
        size, size, AV_PIX_FMT_RGB24, SWS_AREA, nullptr, nullptr, nullptr);
    if (!rgb_sws) return true;
    uint8_t* dst[1] = {out + fstride * written};
    int dst_stride[1] = {size * 3};
    sws_scale(rgb_sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
    out_idx[written] = idx;
    ++written;
    ++next;
    return true;
  });
  if (rgb_sws) sws_freeContext(rgb_sws);
  if (rc2 < 0 && written == 0) return rc2;
  return written;
}

}  // extern "C"

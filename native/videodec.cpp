// tpuseg native video decoder: multi-threaded decode + resize ring buffer.
//
// The reference's video path decodes with single-threaded OpenCV inside the
// Python loop (seg_video.py:113-139), which measures ~83 fps for 1024x2048
// on this host — below the TPU device rate, making host decode the
// end-to-end bottleneck.  This library supplies the TPU-native runtime
// answer: an ffmpeg (libavformat/libavcodec) demux+decode pipeline with
// codec-level frame threading, a pool of libswscale workers doing
// BGR->RGB + resize in parallel, and a sequenced ring buffer handing
// borrowed frame slots to Python (zero-copy via ctypes).
//
// C API (ctypes-friendly):
//   void*   vdec_open(path, out_w, out_h, decode_threads, sws_threads, ring)
//   int     vdec_info(h, int* w, int* h_, double* fps, int64_t* nframes)
//   int64_t vdec_acquire(h, uint8_t** data)  // blocks; returns seq or -1 EOF
//   void    vdec_release(h, int64_t seq)     // consumer done with the slot
//   void    vdec_close(h)
//
// Build: python -m tpuseg.native_build (adds -lavformat -lavcodec -lavutil
// -lswscale).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

// libswscale's RGB24 scaler is slow (measured ~21 ms for 640p->2048x1024 on
// this host); OpenCV's SIMD resize does it in ~3 ms.  So the worker converts
// yuv->RGB24 at SOURCE resolution with sws and resizes with cv::resize.
#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>

namespace {

struct Slot {
  std::vector<uint8_t> rgb;      // out_w*out_h*3 (RGB24) or *3/2 (I420)
  int64_t seq = -1;              // which frame occupies the slot
  bool ready = false;            // converted, waiting for consumer
  bool in_use = false;           // handed to consumer, not yet released
};

struct PendingFrame {
  AVFrame* frame;
  int64_t seq;
};

struct VDec {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;
  int out_w = 0, out_h = 0;
  // 0 = RGB24 interleaved; 1 = I420 packed as (out_h*3/2) rows of out_w
  // bytes (Y plane, then U as out_h/4 rows, then V) — the decoder's own
  // chroma-subsampled format, 1.5 B/px: pairs with the serving pipeline's
  // yuv420 transport so frames never take the RGB detour on the host
  int out_fmt = 0;
  double fps = 0.0;
  int64_t nframes = 0;

  // decoded-frame queue (decode thread -> sws workers)
  std::deque<PendingFrame> decoded;
  bool decode_done = false;
  size_t max_decoded = 8;

  // ring of converted frames (sws workers -> consumer)
  std::vector<Slot> ring;
  int64_t next_consume = 0;   // next seq the consumer will take
  int64_t produced = 0;       // total frames pushed to `decoded`
  int64_t converted = 0;      // frames converted (for EOF detection)

  std::mutex mu;
  std::condition_variable cv_decoded;   // decoded queue not empty / not full
  std::condition_variable cv_ring;      // ring slot became ready or free
  std::atomic<bool> stop{false};
  std::string error;

  std::thread decoder;
  std::vector<std::thread> workers;

  // single owner of the libav contexts: vdec_open2's early-failure returns
  // (unique_ptr destruction) and vdec_close's `delete` both land here, so
  // no path leaks the demuxer/decoder
  ~VDec() {
    for (auto& pf : decoded) av_frame_free(&pf.frame);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

void decode_loop(VDec* v) {
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t seq = 0;
  bool flushing = false;
  while (!v->stop.load()) {
    if (!flushing) {
      int r = av_read_frame(v->fmt, pkt);
      if (r < 0) {
        flushing = true;
        avcodec_send_packet(v->codec, nullptr);  // enter drain mode
      } else {
        if (pkt->stream_index != v->stream_index) {
          av_packet_unref(pkt);
          continue;
        }
        if (avcodec_send_packet(v->codec, pkt) < 0) {
          av_packet_unref(pkt);
          continue;
        }
        av_packet_unref(pkt);
      }
    }
    while (true) {
      int r = avcodec_receive_frame(v->codec, frame);
      if (r == AVERROR(EAGAIN)) break;
      if (r == AVERROR_EOF || r < 0) {
        flushing = true;
        goto done;
      }
      AVFrame* keep = av_frame_alloc();
      av_frame_move_ref(keep, frame);
      std::unique_lock<std::mutex> lk(v->mu);
      v->cv_decoded.wait(lk, [v] {
        return v->stop.load() || v->decoded.size() < v->max_decoded;
      });
      if (v->stop.load()) {
        av_frame_free(&keep);
        goto done;
      }
      v->decoded.push_back({keep, seq++});
      v->produced = seq;
      lk.unlock();
      v->cv_decoded.notify_all();
    }
    if (flushing) break;
  }
done:
  {
    std::lock_guard<std::mutex> lk(v->mu);
    v->decode_done = true;
  }
  v->cv_decoded.notify_all();
  v->cv_ring.notify_all();
  av_frame_free(&frame);
  av_packet_free(&pkt);
}

void sws_loop(VDec* v) {
  // one resize per worker thread; OpenCV's own pool would oversubscribe
  cv::setNumThreads(0);
  SwsContext* sws = nullptr;
  int src_w = -1, src_h = -1;
  AVPixelFormat src_fmt = AV_PIX_FMT_NONE;
  bool src_is_rgb = false;  // RGB-family input (sws does the YUV conversion)
  while (true) {
    PendingFrame pf{nullptr, -1};
    {
      std::unique_lock<std::mutex> lk(v->mu);
      v->cv_decoded.wait(lk, [v] {
        return v->stop.load() || !v->decoded.empty() || v->decode_done;
      });
      if (v->stop.load()) break;
      if (v->decoded.empty()) {
        if (v->decode_done) break;
        continue;
      }
      pf = v->decoded.front();
      v->decoded.pop_front();
      lk.unlock();
      v->cv_decoded.notify_all();
    }
    // wait for the ring slot of this seq to be free (consumer released it)
    Slot* slot = &v->ring[pf.seq % v->ring.size()];
    {
      std::unique_lock<std::mutex> lk(v->mu);
      v->cv_ring.wait(lk, [&] {
        return v->stop.load() || (!slot->ready && !slot->in_use);
      });
      if (v->stop.load()) {
        av_frame_free(&pf.frame);
        break;
      }
      slot->seq = pf.seq;  // claim while holding the lock
      slot->in_use = true; // guard against another worker racing this slot
    }
    if (!sws || pf.frame->width != src_w || pf.frame->height != src_h ||
        (AVPixelFormat)pf.frame->format != src_fmt) {
      if (sws) sws_freeContext(sws);
      src_w = pf.frame->width;
      src_h = pf.frame->height;
      src_fmt = (AVPixelFormat)pf.frame->format;
      // convert at SOURCE resolution (cheap); cv::resize does the scaling.
      // For I420 output the source is usually already YUV420P, so this
      // sws pass degenerates to a plane copy.
      sws = sws_getContext(
          src_w, src_h, src_fmt, src_w, src_h,
          v->out_fmt == 1 ? AV_PIX_FMT_YUV420P : AV_PIX_FMT_RGB24,
          SWS_BILINEAR, nullptr, nullptr, nullptr);
      const AVPixFmtDescriptor* desc = av_pix_fmt_desc_get(src_fmt);
      src_is_rgb = desc && (desc->flags & AV_PIX_FMT_FLAG_RGB);
    }
    if (v->out_fmt == 1) {
      // the packed-I420 contract is FULL-range BT.601 (the exact inverse
      // of tpuseg.video.yuv's device-side reconstruction); most sources
      // are studio-range, and sws's unscaled YUV->YUV path does NOT
      // range-convert, so expand explicitly with LUTs after conversion.
      // RGB-family sources carry a JPEG range tag but sws's RGB->YUV
      // converters emit STUDIO range regardless (and silently ignore
      // sws_setColorspaceDetails for some formats, e.g. BGR24), so the
      // tag must not suppress the expansion there.
      const bool expand =
          src_is_rgb || pf.frame->color_range != AVCOL_RANGE_JPEG;
      static const auto luts = [] {
        struct L { uint8_t y[256], c[256]; } t;
        for (int i = 0; i < 256; ++i) {
          int y = ((i - 16) * 255 + 109) / 219;
          int c = ((i - 128) * 255 + (i >= 128 ? 112 : -112)) / 224 + 128;
          t.y[i] = (uint8_t)(y < 0 ? 0 : y > 255 ? 255 : y);
          t.c[i] = (uint8_t)(c < 0 ? 0 : c > 255 ? 255 : c);
        }
        return t;
      }();
      const int ow = v->out_w, oh = v->out_h;
      auto planes = [](uint8_t* base, int w, int h, uint8_t* dst[4],
                       int stride[4]) {
        dst[0] = base;
        dst[1] = base + (size_t)w * h;
        dst[2] = base + (size_t)w * h + (size_t)w * h / 4;
        dst[3] = nullptr;
        stride[0] = w; stride[1] = w / 2; stride[2] = w / 2; stride[3] = 0;
      };
      if (src_w == ow && src_h == oh) {
        uint8_t* dst[4]; int stride[4];
        planes(slot->rgb.data(), ow, oh, dst, stride);
        sws_scale(sws, pf.frame->data, pf.frame->linesize, 0, src_h, dst,
                  stride);
      } else {
        thread_local std::vector<uint8_t> tmp;
        tmp.resize((size_t)src_w * src_h * 3 / 2);
        uint8_t* dst[4]; int stride[4];
        planes(tmp.data(), src_w, src_h, dst, stride);
        sws_scale(sws, pf.frame->data, pf.frame->linesize, 0, src_h, dst,
                  stride);
        uint8_t* out[4]; int ostride[4];
        planes(slot->rgb.data(), ow, oh, out, ostride);
        // per-plane SIMD resize (luma full-res, chroma half-res)
        cv::resize(cv::Mat(src_h, src_w, CV_8UC1, dst[0]),
                   cv::Mat(oh, ow, CV_8UC1, out[0]),
                   cv::Size(ow, oh), 0, 0, cv::INTER_LINEAR);
        cv::resize(cv::Mat(src_h / 2, src_w / 2, CV_8UC1, dst[1]),
                   cv::Mat(oh / 2, ow / 2, CV_8UC1, out[1]),
                   cv::Size(ow / 2, oh / 2), 0, 0, cv::INTER_LINEAR);
        cv::resize(cv::Mat(src_h / 2, src_w / 2, CV_8UC1, dst[2]),
                   cv::Mat(oh / 2, ow / 2, CV_8UC1, out[2]),
                   cv::Size(ow / 2, oh / 2), 0, 0, cv::INTER_LINEAR);
      }
      if (expand) {
        uint8_t* buf = slot->rgb.data();
        const size_t ny = (size_t)ow * oh;
        for (size_t i = 0; i < ny; ++i) buf[i] = luts.y[buf[i]];
        for (size_t i = ny; i < ny + ny / 2; ++i) buf[i] = luts.c[buf[i]];
      }
    } else if (src_w == v->out_w && src_h == v->out_h) {
      uint8_t* dst[4] = {slot->rgb.data(), nullptr, nullptr, nullptr};
      int dst_stride[4] = {v->out_w * 3, 0, 0, 0};
      sws_scale(sws, pf.frame->data, pf.frame->linesize, 0, src_h, dst,
                dst_stride);
    } else {
      thread_local std::vector<uint8_t> tmp;
      tmp.resize((size_t)src_w * src_h * 3);
      uint8_t* dst[4] = {tmp.data(), nullptr, nullptr, nullptr};
      int dst_stride[4] = {src_w * 3, 0, 0, 0};
      sws_scale(sws, pf.frame->data, pf.frame->linesize, 0, src_h, dst,
                dst_stride);
      cv::Mat src_mat(src_h, src_w, CV_8UC3, tmp.data());
      cv::Mat dst_mat(v->out_h, v->out_w, CV_8UC3, slot->rgb.data());
      cv::resize(src_mat, dst_mat, dst_mat.size(), 0, 0, cv::INTER_LINEAR);
    }
    av_frame_free(&pf.frame);
    {
      std::lock_guard<std::mutex> lk(v->mu);
      slot->in_use = false;
      slot->ready = true;
      v->converted++;
    }
    v->cv_ring.notify_all();
  }
  if (sws) sws_freeContext(sws);
}

}  // namespace

extern "C" {

// out_fmt: 0 = RGB24 (out_h, out_w, 3); 1 = packed I420 (out_h*3/2, out_w)
// — requires out dims with h % 4 == 0 and w % 2 == 0.
void* vdec_open2(const char* path, int out_w, int out_h, int decode_threads,
                 int sws_threads, int ring_capacity, int out_fmt) {
  auto v = std::make_unique<VDec>();
  v->out_fmt = out_fmt;
  if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) return nullptr;
  if (avformat_find_stream_info(v->fmt, nullptr) < 0) return nullptr;
  const AVCodec* dec = nullptr;
  v->stream_index =
      av_find_best_stream(v->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (v->stream_index < 0 || !dec) return nullptr;
  AVStream* st = v->fmt->streams[v->stream_index];
  v->codec = avcodec_alloc_context3(dec);
  if (avcodec_parameters_to_context(v->codec, st->codecpar) < 0) return nullptr;
  // codec-level frame threading: the decoder itself parallelizes across
  // frames (this is what single-threaded cv2 leaves on the table)
  v->codec->thread_count = decode_threads > 0 ? decode_threads : 0;
  v->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(v->codec, dec, nullptr) < 0) return nullptr;

  v->out_w = out_w > 0 ? out_w : v->codec->width;
  v->out_h = out_h > 0 ? out_h : v->codec->height;
  AVRational fr = st->avg_frame_rate;
  v->fps = fr.den ? (double)fr.num / fr.den : 0.0;
  v->nframes = st->nb_frames;

  if (v->out_fmt == 1 && (v->out_h % 4 || v->out_w % 2))
    return nullptr;  // I420 packing needs h % 4 == 0 and w % 2 == 0
  int cap = ring_capacity > 1 ? ring_capacity : 8;
  v->ring.resize(cap);
  size_t frame_bytes = v->out_fmt == 1
                           ? (size_t)v->out_w * v->out_h * 3 / 2
                           : (size_t)v->out_w * v->out_h * 3;
  for (auto& s : v->ring) s.rgb.resize(frame_bytes);

  VDec* raw = v.release();
  raw->decoder = std::thread(decode_loop, raw);
  int nw = sws_threads > 0 ? sws_threads : 2;
  for (int i = 0; i < nw; ++i) raw->workers.emplace_back(sws_loop, raw);
  return raw;
}

void* vdec_open(const char* path, int out_w, int out_h, int decode_threads,
                int sws_threads, int ring_capacity) {
  return vdec_open2(path, out_w, out_h, decode_threads, sws_threads,
                    ring_capacity, 0);
}

int vdec_info(void* h, int* w, int* ht, double* fps, int64_t* nframes) {
  auto* v = (VDec*)h;
  if (!v) return -1;
  if (w) *w = v->out_w;
  if (ht) *ht = v->out_h;
  if (fps) *fps = v->fps;
  if (nframes) *nframes = v->nframes;
  return 0;
}

// Blocks until the next in-order frame is converted; hands the slot's RGB
// pointer to the caller.  Returns the seq (>=0), or -1 on EOF, -2 on error.
int64_t vdec_acquire(void* h, uint8_t** data) {
  auto* v = (VDec*)h;
  if (!v) return -2;
  std::unique_lock<std::mutex> lk(v->mu);
  int64_t seq = v->next_consume;
  Slot* slot = &v->ring[seq % v->ring.size()];
  v->cv_ring.wait(lk, [&] {
    if (v->stop.load()) return true;
    if (slot->ready && slot->seq == seq) return true;
    // EOF: decoder finished, everything produced has been converted, and
    // this seq was never produced
    return v->decode_done && v->decoded.empty() && v->converted == v->produced &&
           seq >= v->produced;
  });
  if (v->stop.load()) return -2;
  if (!(slot->ready && slot->seq == seq)) return -1;  // EOF
  slot->in_use = true;
  slot->ready = false;
  v->next_consume = seq + 1;
  *data = slot->rgb.data();
  return seq;
}

void vdec_release(void* h, int64_t seq) {
  auto* v = (VDec*)h;
  if (!v) return;
  {
    std::lock_guard<std::mutex> lk(v->mu);
    Slot* slot = &v->ring[seq % v->ring.size()];
    if (slot->seq == seq) slot->in_use = false;
  }
  v->cv_ring.notify_all();
}

void vdec_close(void* h) {
  auto* v = (VDec*)h;
  if (!v) return;
  v->stop.store(true);
  v->cv_decoded.notify_all();
  v->cv_ring.notify_all();
  if (v->decoder.joinable()) v->decoder.join();
  for (auto& t : v->workers)
    if (t.joinable()) t.join();
  delete v;  // ~VDec frees queued frames + codec + format contexts
}

}  // extern "C"

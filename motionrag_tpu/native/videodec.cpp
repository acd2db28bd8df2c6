// Native video decoder: libavformat/libavcodec/libswscale.
//
// TPU-native replacement for the reference's PyAV decode path
// (reference src/utils/video.py:137-211 read_video_av): pts-targeted
// uniform frame sampling with decoder-side aspect-preserving resize to
// RGB24. Exposed as a C ABI consumed via ctypes
// (motionrag_tpu/data/video_io.py); the host data pipeline runs K+1 of
// these decodes per sample (reference dataset.py:285-312) overlapped with
// device compute.
//
// Build: make -C motionrag_tpu/native   (links avformat/avcodec/swscale)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct Probe {
  int height;
  int width;
  double fps;
  int64_t num_frames;
};

int probe_stream(AVFormatContext* fmt, int* stream_idx, Probe* out) {
  int idx = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (idx < 0) return -2;
  AVStream* st = fmt->streams[idx];
  out->height = st->codecpar->height;
  out->width = st->codecpar->width;
  AVRational fr = st->avg_frame_rate;
  out->fps = fr.den ? av_q2d(fr) : 0.0;
  out->num_frames = st->nb_frames;
  if (out->num_frames <= 0 && out->fps > 0 && fmt->duration > 0) {
    out->num_frames = (int64_t)(out->fps * fmt->duration / AV_TIME_BASE);
  }
  *stream_idx = idx;
  return 0;
}

int interp_flags(int interp) {
  switch (interp) {
    case 0: return SWS_FAST_BILINEAR;
    case 1: return SWS_BILINEAR;
    case 2: return SWS_BICUBIC;
    case 3: return SWS_POINT;
    case 4: return SWS_AREA;
    case 5: return SWS_LANCZOS;
    default: return SWS_BICUBIC;
  }
}

}  // namespace

extern "C" {

// Probe video metadata. Returns 0 on success.
int vd_probe(const char* path, int* height, int* width, double* fps,
             int64_t* num_frames) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -3;
  }
  int idx;
  Probe p;
  int rc = probe_stream(fmt, &idx, &p);
  if (rc == 0) {
    *height = p.height;
    *width = p.width;
    *fps = p.fps;
    *num_frames = p.num_frames;
  }
  avformat_close_input(&fmt);
  return rc;
}

// Decode num_frame uniformly pts-sampled RGB24 frames from [start_sec,
// end_sec) resized to (out_h, out_w). `out` must hold
// num_frame*out_h*out_w*3 bytes. Returns 0 on success, <0 on error,
// n>0 = n frames missing.
int vd_read(const char* path, double start_sec, double end_sec, int num_frame,
            int out_h, int out_w, int interp, int threads, uint8_t* out) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return -3;
  }
  int idx;
  Probe p;
  if (probe_stream(fmt, &idx, &p) != 0) {
    avformat_close_input(&fmt);
    return -2;
  }
  AVStream* st = fmt->streams[idx];

  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!codec) {
    avformat_close_input(&fmt);
    return -4;
  }
  AVCodecContext* ctx = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(ctx, st->codecpar);
  ctx->thread_count = threads > 0 ? threads : 1;
  ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(ctx, codec, nullptr) < 0) {
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);
    return -5;
  }

  // pts targets: linspace(start_pts, end_pts - 2*delta, num_frame)
  // (reference video.py:181-183)
  const double tb = av_q2d(st->time_base);
  const double fps = p.fps > 0 ? p.fps : 30.0;
  const int64_t start_pts = (int64_t)llround(start_sec / tb);
  const int64_t end_pts = (int64_t)llround(end_sec / tb);
  const int64_t delta = (int64_t)(1.0 / fps / tb) / 2;
  std::vector<int64_t> targets(num_frame);
  if (num_frame == 1) {
    targets[0] = start_pts;
  } else {
    const double lo = (double)start_pts, hi = (double)(end_pts - 2 * delta);
    for (int i = 0; i < num_frame; ++i)
      targets[i] = (int64_t)(lo + (hi - lo) * i / (num_frame - 1));
  }

  if (start_pts > 0)
    av_seek_frame(fmt, idx, start_pts, AVSEEK_FLAG_BACKWARD);

  SwsContext* sws = nullptr;
  AVFrame* frame = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  int ti = 0;
  int rc = 0;
  const int out_stride[1] = {out_w * 3};

  while (ti < num_frame) {
    int r = av_read_frame(fmt, pkt);
    bool flushing = r < 0;
    if (!flushing && pkt->stream_index != idx) {
      av_packet_unref(pkt);
      continue;
    }
    if (avcodec_send_packet(ctx, flushing ? nullptr : pkt) < 0 && !flushing) {
      av_packet_unref(pkt);
      rc = -6;
      break;
    }
    av_packet_unref(pkt);
    int recv;
    while ((recv = avcodec_receive_frame(ctx, frame)) == 0 && ti < num_frame) {
      int64_t pts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                        ? frame->best_effort_timestamp
                        : frame->pts;
      // one target per decoded frame (reference video.py:190-198 semantics)
      if (pts >= targets[ti] - delta) {
        if (!sws) {
          sws = sws_getContext(frame->width, frame->height,
                               (AVPixelFormat)frame->format, out_w, out_h,
                               AV_PIX_FMT_RGB24, interp_flags(interp), nullptr,
                               nullptr, nullptr);
          if (!sws) {
            rc = -7;
            break;
          }
        }
        uint8_t* dst[1] = {out + (size_t)ti * out_h * out_w * 3};
        sws_scale(sws, frame->data, frame->linesize, 0, frame->height, dst,
                  out_stride);
        ++ti;
      }
      if (rc != 0) break;
    }
    if (rc != 0) break;
    if (flushing && recv != 0) break;  // drained
  }

  if (rc == 0 && ti < num_frame) rc = num_frame - ti;  // frames missing

  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  avformat_close_input(&fmt);
  return rc;
}

}  // extern "C"

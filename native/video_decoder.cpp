// Native video decoder: container demux + codec decode + gray conversion.
//
// The data-loader of the framework.  Role-equivalent of the reference's
// browser video element feeding ImageData into the WASM heap (reference
// examples/public/assets/utils.js:112-239 Video + examples/public/
// video.html:148-195 per-frame loop): here a file is demuxed/decoded in
// native code (FFmpeg libav*) and handed to Python as grayscale uint8
// frames with presentation timestamps, ready for FrameRing/device upload.
//
// Plain C ABI for ctypes (no pybind11 in this build).

#include <cstdint>
#include <cstring>
#include <new>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

extern "C" {

struct VideoDecoder {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* codec = nullptr;
    SwsContext* sws = nullptr;
    AVPacket* pkt = nullptr;
    AVFrame* frame = nullptr;
    int stream_index = -1;
    int width = 0;
    int height = 0;
    double fps = 0.0;
    double time_base = 0.0;
    long long nframes = 0;
    bool eof_sent = false;
};

void vd_close(VideoDecoder* d) {
    if (!d) return;
    if (d->sws) sws_freeContext(d->sws);
    if (d->frame) av_frame_free(&d->frame);
    if (d->pkt) av_packet_free(&d->pkt);
    if (d->codec) avcodec_free_context(&d->codec);
    if (d->fmt) avformat_close_input(&d->fmt);
    delete d;
}

VideoDecoder* vd_open(const char* path) {
    auto* d = new (std::nothrow) VideoDecoder();
    if (!d) return nullptr;
    if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
        delete d;
        return nullptr;
    }
    if (avformat_find_stream_info(d->fmt, nullptr) < 0) goto fail;
    {
        const AVCodec* dec = nullptr;
        d->stream_index = av_find_best_stream(
            d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
        if (d->stream_index < 0 || !dec) goto fail;
        AVStream* st = d->fmt->streams[d->stream_index];
        d->codec = avcodec_alloc_context3(dec);
        if (!d->codec) goto fail;
        if (avcodec_parameters_to_context(d->codec, st->codecpar) < 0)
            goto fail;
        if (avcodec_open2(d->codec, dec, nullptr) < 0) goto fail;
        d->width = d->codec->width;
        d->height = d->codec->height;
        d->time_base = av_q2d(st->time_base);
        AVRational fr = st->avg_frame_rate;
        d->fps = (fr.den > 0) ? av_q2d(fr) : 0.0;
        d->nframes = st->nb_frames;
        d->pkt = av_packet_alloc();
        d->frame = av_frame_alloc();
        if (!d->pkt || !d->frame) goto fail;
    }
    return d;
fail:
    vd_close(d);
    return nullptr;
}

int vd_width(const VideoDecoder* d) { return d ? d->width : 0; }
int vd_height(const VideoDecoder* d) { return d ? d->height : 0; }
double vd_fps(const VideoDecoder* d) { return d ? d->fps : 0.0; }
long long vd_nframes(const VideoDecoder* d) { return d ? d->nframes : 0; }

// Decode the next frame into `gray_out` ([height*width] uint8, GRAY8 via
// swscale — BT.601 limited-range luma, matching browsers' video luma) and
// write its presentation time in seconds to `pts_out`.
// Returns 1 on success, 0 on end-of-stream, -1 on error.
int vd_next_gray(VideoDecoder* d, uint8_t* gray_out, double* pts_out) {
    if (!d || !gray_out) return -1;
    for (;;) {
        int r = avcodec_receive_frame(d->codec, d->frame);
        if (r == 0) {
            if (!d->sws) {
                d->sws = sws_getContext(
                    d->width, d->height,
                    static_cast<AVPixelFormat>(d->frame->format),
                    d->width, d->height, AV_PIX_FMT_GRAY8,
                    SWS_BILINEAR, nullptr, nullptr, nullptr);
                if (!d->sws) return -1;
            }
            uint8_t* dst[4] = {gray_out, nullptr, nullptr, nullptr};
            int dst_stride[4] = {d->width, 0, 0, 0};
            sws_scale(d->sws, d->frame->data, d->frame->linesize, 0,
                      d->height, dst, dst_stride);
            int64_t pts = d->frame->best_effort_timestamp;
            if (pts_out)
                *pts_out = (pts == AV_NOPTS_VALUE)
                               ? -1.0
                               : static_cast<double>(pts) * d->time_base;
            av_frame_unref(d->frame);
            return 1;
        }
        if (r == AVERROR_EOF) return 0;
        if (r != AVERROR(EAGAIN)) return -1;

        // feed more packets
        for (;;) {
            int pr = av_read_frame(d->fmt, d->pkt);
            if (pr >= 0) {
                if (d->pkt->stream_index == d->stream_index) {
                    int sr = avcodec_send_packet(d->codec, d->pkt);
                    av_packet_unref(d->pkt);
                    if (sr < 0 && sr != AVERROR(EAGAIN)) return -1;
                    break;
                }
                av_packet_unref(d->pkt);
                continue;
            }
            // demuxer EOF: flush the codec once
            if (!d->eof_sent) {
                d->eof_sent = true;
                avcodec_send_packet(d->codec, nullptr);
            }
            break;
        }
    }
}

}  // extern "C"

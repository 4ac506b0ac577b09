/* Test-only conformance oracle: thin C ABI over the system libavcodec.
 *
 * Used exclusively by the test suite (tests/av_oracle.py) to validate the
 * framework's bitstreams against an independent reference implementation:
 *   - decode H.264/HEVC Annex-B produced by our encoders and compare the
 *     reconstruction with our own validation decoders (conformance),
 *   - generate golden libx264/libx265/aac streams to exercise our
 *     foreign-stream decode paths and RD harness.
 * The product code (vcp_tpu/) never links or loads this — the framework
 * is self-contained; tests skip when the system libraries are absent.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#ifdef __cplusplus
extern "C" {
#endif
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#ifdef __cplusplus
}
#endif

#ifdef __cplusplus
extern "C" {
#endif

/* ------------------------------------------------------------------ */
/* Video decode: Annex-B elementary stream -> stacked I420 frames.     */
/* out receives nframes * (w*h*3/2) bytes. Returns nframes or <0.      */
/* ------------------------------------------------------------------ */
int64_t av_oracle_decode_video(const char *codec_name, const uint8_t *in,
                               int64_t n, uint8_t *out, int64_t out_cap,
                               int *out_w, int *out_h) {
    const AVCodec *codec = avcodec_find_decoder_by_name(codec_name);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    int64_t written = 0, nframes = 0;
    int w = 0, h = 0, err = 0;

    /* parse the buffer into packets, then drain; a final size-0 parse
     * flushes the parser's buffered access unit */
    const uint8_t *p = in;
    int64_t remaining = n;
    int flushing = 0, parser_done = 0;
    while (!err) {
        if (!parser_done && parser) {
            uint8_t *pd = NULL; int ps = 0;
            int used = av_parser_parse2(parser, ctx, &pd, &ps,
                                        p, (int)remaining,
                                        AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
            if (used < 0) { err = -4; break; }
            p += used; remaining -= used;
            if (remaining == 0 && ps == 0 && used == 0) parser_done = 1;
            if (ps > 0) {
                pkt->data = pd; pkt->size = ps;
                if (avcodec_send_packet(ctx, pkt) < 0) { err = -5; break; }
            } else if (!parser_done) {
                continue;
            }
        }
        if (parser_done && !flushing) {
            flushing = 1;
            avcodec_send_packet(ctx, NULL);
        }
        for (;;) {
            int r = avcodec_receive_frame(ctx, frame);
            if (r == AVERROR(EAGAIN)) break;
            if (r == AVERROR_EOF) { err = 1; break; }   /* done */
            if (r < 0) { err = -6; break; }
            w = frame->width; h = frame->height;
            if (frame->format != AV_PIX_FMT_YUV420P &&
                frame->format != AV_PIX_FMT_YUVJ420P) { err = -7; break; }
            int64_t need = (int64_t)w * h * 3 / 2;
            if (written + need > out_cap) { err = -8; break; }
            for (int plane = 0; plane < 3; plane++) {
                int pw = plane ? w / 2 : w, ph = plane ? h / 2 : h;
                for (int y = 0; y < ph; y++) {
                    memcpy(out + written,
                           frame->data[plane] + (int64_t)y * frame->linesize[plane],
                           pw);
                    written += pw;
                }
            }
            nframes++;
        }
        if (flushing && err == 0) { /* drained EAGAIN after flush: loop again */ }
        if (err) break;
    }
    if (parser) av_parser_close(parser);
    av_frame_free(&frame);
    pkt->data = NULL; pkt->size = 0;   /* parser owns the buffer */
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    if (err < 0) return err;
    *out_w = w; *out_h = h;
    return nframes;
}

/* ------------------------------------------------------------------ */
/* Video encode via libx264/libx265: stacked I420 frames -> Annex-B.   */
/* x264opts, preset may be "" for defaults. Returns bytes or <0.       */
/* ------------------------------------------------------------------ */
int64_t av_oracle_encode_video(const char *codec_name, const char *preset,
                               double crf, int gop, int w, int h, int fps,
                               const char *opts,
                               const uint8_t *frames, int nframes,
                               uint8_t *out, int64_t out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->width = w; ctx->height = h;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){1, fps};
    ctx->framerate = (AVRational){fps, 1};
    if (gop > 0) ctx->gop_size = gop;
    if (preset && preset[0])
        av_opt_set(ctx->priv_data, "preset", preset, 0);
    if (crf >= 0)
        av_opt_set_double(ctx->priv_data, "crf", crf, 0);
    if (opts && opts[0]) {
        /* "key=value;key=value" applied to the encoder's private opts
         * (';' outer separator so x264-params may contain ':') */
        char buf[1024];
        strncpy(buf, opts, sizeof(buf) - 1);
        buf[sizeof(buf) - 1] = 0;
        char *save = NULL;
        for (char *kv = strtok_r(buf, ";", &save); kv;
             kv = strtok_r(NULL, ";", &save)) {
            char *eq = strchr(kv, '=');
            if (!eq) continue;
            *eq = 0;
            av_opt_set(ctx->priv_data, kv, eq + 1, 0);
        }
    }
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    AVFrame *frame = av_frame_alloc();
    frame->format = AV_PIX_FMT_YUV420P;
    frame->width = w; frame->height = h;
    if (av_frame_get_buffer(frame, 0) < 0) { av_frame_free(&frame); avcodec_free_context(&ctx); return -4; }
    AVPacket *pkt = av_packet_alloc();

    int64_t written = 0;
    int err = 0;
    int64_t fsz = (int64_t)w * h * 3 / 2;
    for (int i = 0; i <= nframes && !err; i++) {
        AVFrame *f = NULL;
        if (i < nframes) {
            av_frame_make_writable(frame);
            const uint8_t *src = frames + i * fsz;
            for (int plane = 0; plane < 3; plane++) {
                int pw = plane ? w / 2 : w, ph = plane ? h / 2 : h;
                for (int y = 0; y < ph; y++) {
                    memcpy(frame->data[plane] + (int64_t)y * frame->linesize[plane],
                           src, pw);
                    src += pw;
                }
            }
            frame->pts = i;
            f = frame;
        }
        if (avcodec_send_frame(ctx, f) < 0) { err = -5; break; }
        for (;;) {
            int r = avcodec_receive_packet(ctx, pkt);
            if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
            if (r < 0) { err = -6; break; }
            if (written + pkt->size > out_cap) { err = -7; break; }
            memcpy(out + written, pkt->data, pkt->size);
            written += pkt->size;
            av_packet_unref(pkt);
        }
    }
    /* SPS/PPS may live in extradata (global header off by default for
     * raw contexts, so usually in-band; append extradata defensively) */
    av_packet_free(&pkt);
    av_frame_free(&frame);
    avcodec_free_context(&ctx);
    return err ? err : written;
}

/* ------------------------------------------------------------------ */
/* Container mux: H.264 Annex-B elementary stream -> AVI (in memory).  */
/* Exercises the product's RIFF/AVI ingest against a genuine           */
/* libavformat-written AVI. Returns bytes or <0.                       */
/* ------------------------------------------------------------------ */
int64_t av_oracle_mux_avi(const uint8_t *annexb, int64_t n, int w, int h,
                          int fps, uint8_t *out, int64_t out_cap) {
    /* a real temp file, not a dyn buf: the AVI muxer back-patches sizes
     * with seeks that misbehave on libavformat's dynamic buffer */
    char path[] = "/tmp/av_oracle_avi_XXXXXX";
    int fd = mkstemp(path);
    if (fd < 0) return -1;
    close(fd);
    AVFormatContext *oc = NULL;
    if (avformat_alloc_output_context2(&oc, NULL, "avi", path) < 0 || !oc) {
        unlink(path);
        return -1;
    }
    AVStream *st = avformat_new_stream(oc, NULL);
    if (!st) { avformat_free_context(oc); unlink(path); return -2; }
    st->codecpar->codec_type = AVMEDIA_TYPE_VIDEO;
    st->codecpar->codec_id = AV_CODEC_ID_H264;
    st->codecpar->width = w;
    st->codecpar->height = h;
    st->time_base = (AVRational){1, fps};
    st->avg_frame_rate = (AVRational){fps, 1};
    if (avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) {
        avformat_free_context(oc);
        unlink(path);
        return -3;
    }
    if (avformat_write_header(oc, NULL) < 0) {
        avio_closep(&oc->pb);
        avformat_free_context(oc);
        unlink(path);
        return -4;
    }

    const AVCodec *dec = avcodec_find_decoder(AV_CODEC_ID_H264);
    AVCodecContext *ctx = avcodec_alloc_context3(dec);
    AVCodecParserContext *parser = av_parser_init(AV_CODEC_ID_H264);
    AVPacket *pkt = av_packet_alloc();
    const uint8_t *p = annexb;
    int64_t remaining = n, idx = 0;
    int err = 0;
    while (remaining > 0 && !err) {
        uint8_t *pd = NULL; int ps = 0;
        int used = av_parser_parse2(parser, ctx, &pd, &ps, p,
                                    (int)remaining, AV_NOPTS_VALUE,
                                    AV_NOPTS_VALUE, 0);
        if (used < 0) { err = -5; break; }
        p += used; remaining -= used;
        if (ps > 0) {
            pkt->data = pd; pkt->size = ps;
            pkt->pts = pkt->dts = av_rescale_q(idx, (AVRational){1, fps},
                                               st->time_base);
            pkt->duration = av_rescale_q(1, (AVRational){1, fps},
                                         st->time_base);
            pkt->stream_index = 0;
            pkt->flags = parser->key_frame ? AV_PKT_FLAG_KEY : 0;
            if (av_write_frame(oc, pkt) < 0) err = -6;
            idx++;
        } else if (used == 0) {
            break;  /* parser is stalled (trailing partial AU) */
        }
    }
    /* flush the parser's final buffered access unit */
    if (!err) {
        uint8_t *pd = NULL; int ps = 0;
        av_parser_parse2(parser, ctx, &pd, &ps, NULL, 0, AV_NOPTS_VALUE,
                         AV_NOPTS_VALUE, 0);
        if (ps > 0) {
            pkt->data = pd; pkt->size = ps;
            pkt->pts = pkt->dts = av_rescale_q(idx, (AVRational){1, fps},
                                               st->time_base);
            pkt->stream_index = 0;
            if (av_write_frame(oc, pkt) < 0) err = -6;
        }
    }
    if (!err && av_write_trailer(oc) < 0) err = -7;
    avio_closep(&oc->pb);
    av_parser_close(parser);
    pkt->data = NULL; pkt->size = 0;
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    avformat_free_context(oc);
    int64_t size = 0;
    if (!err) {
        FILE *f = fopen(path, "rb");
        if (!f) err = -8;
        else {
            size = (int64_t)fread(out, 1, out_cap, f);
            if (!feof(f)) err = -9;   /* out_cap too small */
            fclose(f);
        }
    }
    unlink(path);
    return err ? err : size;
}

/* ------------------------------------------------------------------ */
/* AAC encode: interleaved s16 PCM -> ADTS stream. Returns bytes.      */
/* ------------------------------------------------------------------ */
static const int adts_rate_index_tab[13] = {
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350};

static int adts_rate_index(int rate) {
    for (int i = 0; i < 13; i++)
        if (adts_rate_index_tab[i] == rate) return i;
    return -1;
}

int64_t av_oracle_encode_aac(const int16_t *pcm, int64_t nsamples,
                             int channels, int rate, int bitrate,
                             uint8_t *out, int64_t out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name("aac");
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    ctx->sample_rate = rate;
    ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    ctx->bit_rate = bitrate;
#if LIBAVCODEC_VERSION_MAJOR >= 59
    av_channel_layout_default(&ctx->ch_layout, channels);
#else
    ctx->channels = channels;
    ctx->channel_layout = av_get_default_channel_layout(channels);
#endif
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    int ri = adts_rate_index(rate);
    if (ri < 0) { avcodec_free_context(&ctx); return -4; }

    AVFrame *frame = av_frame_alloc();
    frame->format = AV_SAMPLE_FMT_FLTP;
    frame->nb_samples = ctx->frame_size;
#if LIBAVCODEC_VERSION_MAJOR >= 59
    av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
#else
    frame->channels = channels;
    frame->channel_layout = ctx->channel_layout;
#endif
    if (av_frame_get_buffer(frame, 0) < 0) { av_frame_free(&frame); avcodec_free_context(&ctx); return -5; }
    AVPacket *pkt = av_packet_alloc();

    int64_t frames_total = nsamples / ctx->frame_size;
    int64_t written = 0;
    int err = 0;
    for (int64_t i = 0; i <= frames_total && !err; i++) {
        AVFrame *f = NULL;
        if (i < frames_total) {
            av_frame_make_writable(frame);
            for (int c = 0; c < channels; c++) {
                float *dst = (float *)frame->data[c];
                for (int s = 0; s < ctx->frame_size; s++)
                    dst[s] = pcm[(i * ctx->frame_size + s) * channels + c]
                             / 32768.0f;
            }
            frame->pts = i * ctx->frame_size;
            f = frame;
        }
        if (avcodec_send_frame(ctx, f) < 0) { err = -6; break; }
        for (;;) {
            int r = avcodec_receive_packet(ctx, pkt);
            if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
            if (r < 0) { err = -7; break; }
            int aulen = pkt->size + 7;
            if (written + aulen > out_cap) { err = -8; break; }
            /* ADTS header (no CRC) */
            uint8_t *o = out + written;
            o[0] = 0xFF; o[1] = 0xF1;
            o[2] = (uint8_t)((1 << 6) | (ri << 2) | ((channels >> 2) & 1));
            o[3] = (uint8_t)(((channels & 3) << 6) | ((aulen >> 11) & 3));
            o[4] = (uint8_t)((aulen >> 3) & 0xFF);
            o[5] = (uint8_t)(((aulen & 7) << 5) | 0x1F);
            o[6] = 0xFC;
            memcpy(o + 7, pkt->data, pkt->size);
            written += aulen;
            av_packet_unref(pkt);
        }
    }
    av_packet_free(&pkt);
    av_frame_free(&frame);
    avcodec_free_context(&ctx);
    return err ? err : written;
}

/* ------------------------------------------------------------------ */
/* AAC decode: ADTS stream -> interleaved float PCM. Returns samples   */
/* per channel.                                                        */
/* ------------------------------------------------------------------ */
int64_t av_oracle_decode_aac(const uint8_t *in, int64_t n, float *out,
                             int64_t out_cap_samples, int *out_channels,
                             int *out_rate) {
    const AVCodec *codec = avcodec_find_decoder_by_name("aac");
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    if (avcodec_open2(ctx, codec, NULL) < 0) { avcodec_free_context(&ctx); return -3; }

    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    const uint8_t *p = in;
    int64_t remaining = n, written = 0;
    int channels = 0, rate = 0, err = 0, flushing = 0, parser_done = 0;
    while (!err) {
        if (!parser_done) {
            uint8_t *pd = NULL; int ps = 0;
            int used = av_parser_parse2(parser, ctx, &pd, &ps, p,
                                        (int)remaining, AV_NOPTS_VALUE,
                                        AV_NOPTS_VALUE, 0);
            if (used < 0) { err = -4; break; }
            p += used; remaining -= used;
            if (remaining == 0 && ps == 0 && used == 0) parser_done = 1;
            if (ps > 0) {
                pkt->data = pd; pkt->size = ps;
                if (avcodec_send_packet(ctx, pkt) < 0) { err = -5; break; }
            } else if (!parser_done) continue;
        }
        if (parser_done && !flushing) {
            flushing = 1;
            avcodec_send_packet(ctx, NULL);
        }
        for (;;) {
            int r = avcodec_receive_frame(ctx, frame);
            if (r == AVERROR(EAGAIN)) break;
            if (r == AVERROR_EOF) { err = 1; break; }
            if (r < 0) { err = -6; break; }
#if LIBAVCODEC_VERSION_MAJOR >= 59
            channels = frame->ch_layout.nb_channels;
#else
            channels = frame->channels;
#endif
            rate = frame->sample_rate;
            if (frame->format != AV_SAMPLE_FMT_FLTP) { err = -7; break; }
            if (written + (int64_t)frame->nb_samples * channels >
                out_cap_samples) { err = -8; break; }
            for (int s = 0; s < frame->nb_samples; s++)
                for (int c = 0; c < channels; c++)
                    out[written++] = ((float *)frame->data[c])[s];
        }
        if (err) break;
    }
    if (parser) av_parser_close(parser);
    av_frame_free(&frame);
    pkt->data = NULL; pkt->size = 0;
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    if (err < 0) return err;
    *out_channels = channels; *out_rate = rate;
    return channels ? written / channels : 0;
}

#ifdef __cplusplus
}  /* extern "C" */
#endif

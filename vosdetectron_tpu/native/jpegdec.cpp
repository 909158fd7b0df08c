// Native JPEG -> packed yuv420 decoder (libjpeg-turbo raw-data path).
//
// The reference decodes frames with cv2.imread (BGR) inside its per-frame
// loop (reference: lib/utils/blob.py prep path, SURVEY.md §3.2-3.3). Our
// host pipeline uploads 4:2:0 YCbCr to the TPU (engine/vos.py
// _to_yuv420_packed) — but JPEG files already STORE 4:2:0 YCbCr, so
// decoding to BGR and re-converting back to YCbCr does two pointless
// color transforms plus a chroma up/down-sample per frame. This decoder
// asks libjpeg for the raw subsampled planes (jpeg_read_raw_data) and
// writes them straight into the packed upload layout:
//
//   out[0 : H*W]                      Y  plane, row-major
//   out[H*W : H*W + CH*CW*2]          UV interleaved, (CH, CW, 2)
//
// where (CH, CW) = (H/2, W/2) for den=2 (standard 4:2:0) or
// (ceil(H/4), ceil(W/4)) for den=4 (an extra 2x2 chroma box filter —
// 1.125 B/px instead of 1.5, for upload-bandwidth-bound hosts).
//
// den=2 output is byte-identical in layout to _to_yuv420_packed's (values
// are the encoder's own planes — strictly more faithful than the
// BGR->I420 re-encode). Runs with the GIL released (plain C ABI via
// ctypes), so decode overlaps the upload streams' serialization work.
//
// Only baseline/progressive 3-component YCbCr 4:2:0 with even dimensions
// takes this path; anything else returns 1 and the caller falls back to
// cv2. Returns 0 on success, negative on decode error.

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void on_emit(j_common_ptr, int) {}  // silence warnings

}  // namespace

extern "C" {

// Header-only probe. Fills h, w, and is420 (1 when the raw fast path
// applies). Returns 0 ok, negative on parse error.
int jpeg_probe(const uint8_t* data, int64_t len, int* h, int* w,
               int* is420) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  jerr.pub.emit_message = on_emit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *h = static_cast<int>(cinfo.image_height);
  *w = static_cast<int>(cinfo.image_width);
  const bool ok420 =
      cinfo.num_components == 3 && cinfo.jpeg_color_space == JCS_YCbCr &&
      cinfo.comp_info[0].h_samp_factor == 2 &&
      cinfo.comp_info[0].v_samp_factor == 2 &&
      cinfo.comp_info[1].h_samp_factor == 1 &&
      cinfo.comp_info[1].v_samp_factor == 1 &&
      cinfo.comp_info[2].h_samp_factor == 1 &&
      cinfo.comp_info[2].v_samp_factor == 1 &&
      cinfo.image_height % 2 == 0 && cinfo.image_width % 2 == 0;
  *is420 = ok420 ? 1 : 0;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode one 4:2:0 JPEG into the packed yuv layout described above.
// out must hold h*w + CH*CW*2 bytes (h, w from jpeg_probe; CH/CW per
// den). den must be 2 or 4.
// Returns 0 ok, 1 not-4:2:0 (caller falls back), negative decode error.
int decode_jpeg_yuv420(const uint8_t* data, int64_t len, uint8_t* out,
                       int64_t out_cap, int den) {
  if (den != 2 && den != 4) return -4;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = on_error;
  jerr.pub.emit_message = on_emit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);

  if (!(cinfo.num_components == 3 &&
        cinfo.jpeg_color_space == JCS_YCbCr &&
        cinfo.comp_info[0].h_samp_factor == 2 &&
        cinfo.comp_info[0].v_samp_factor == 2 &&
        cinfo.comp_info[1].h_samp_factor == 1 &&
        cinfo.comp_info[1].v_samp_factor == 1 &&
        cinfo.comp_info[2].h_samp_factor == 1 &&
        cinfo.comp_info[2].v_samp_factor == 1 &&
        cinfo.image_height % 2 == 0 && cinfo.image_width % 2 == 0)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }

  const int h = static_cast<int>(cinfo.image_height);
  const int w = static_cast<int>(cinfo.image_width);
  const int64_t ybytes = static_cast<int64_t>(h) * w;
  const int ch2 = h / 2, cw2 = w / 2;
  const int ch_out = (den == 2) ? ch2 : (ch2 + 1) / 2;
  const int cw_out = (den == 2) ? cw2 : (cw2 + 1) / 2;
  const int64_t need = ybytes + static_cast<int64_t>(ch_out) * cw_out * 2;
  if (out_cap < need) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }

  cinfo.out_color_space = JCS_YCbCr;
  cinfo.raw_data_out = TRUE;
  cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);

  // Raw reads come in MCU-row granularity: 16 Y rows + 8 C rows per call,
  // each row padded to a multiple of the MCU width. Y rows land directly
  // in the output plane (through a padded staging tail for the final
  // partial MCU row / width padding); chroma goes via staging rows and is
  // interleaved into the UV block.
  const int mcu_h = 16;
  const int yw_pad = static_cast<int>(cinfo.comp_info[0].width_in_blocks) *
                     DCTSIZE;
  const int cw_pad = static_cast<int>(cinfo.comp_info[1].width_in_blocks) *
                     DCTSIZE;
  const int cw = w / 2;

  std::vector<uint8_t> ystage(static_cast<size_t>(mcu_h) * yw_pad);
  std::vector<uint8_t> cstage(static_cast<size_t>(mcu_h) * cw_pad);  // 8+8
  JSAMPROW yrows[16], urows[8], vrows[8];
  JSAMPARRAY planes[3] = {yrows, urows, vrows};

  uint8_t* uv = out + ybytes;
  const bool tight_y = (yw_pad == w);

  int row = 0;
  while (cinfo.output_scanline < cinfo.output_height) {
    const int remain = h - row;
    for (int r = 0; r < 16; ++r) {
      if (tight_y && r < remain)
        yrows[r] = out + static_cast<int64_t>(row + r) * w;
      else
        yrows[r] = ystage.data() + static_cast<size_t>(r) * yw_pad;
    }
    for (int r = 0; r < 8; ++r) {
      urows[r] = cstage.data() + static_cast<size_t>(r) * cw_pad;
      vrows[r] = cstage.data() + static_cast<size_t>(8 + r) * cw_pad;
    }
    JDIMENSION got = jpeg_read_raw_data(&cinfo, planes, mcu_h);
    if (got == 0) break;
    const int ny = remain < static_cast<int>(got) ? remain
                                                  : static_cast<int>(got);
    if (!tight_y) {
      for (int r = 0; r < ny; ++r)
        std::memcpy(out + static_cast<int64_t>(row + r) * w,
                    yrows[r], w);
    }
    const int crow0 = row / 2;  // always even: row is a multiple of 16
    const int nc = (ch2 - crow0) < static_cast<int>(got) / 2
                       ? (ch2 - crow0)
                       : static_cast<int>(got) / 2;
    if (den == 2) {
      for (int r = 0; r < nc; ++r) {
        uint8_t* dst = uv + static_cast<int64_t>(crow0 + r) * cw * 2;
        const uint8_t* us = urows[r];
        const uint8_t* vs = vrows[r];
        for (int x = 0; x < cw; ++x) {
          dst[2 * x] = us[x];
          dst[2 * x + 1] = vs[x];
        }
      }
    } else {  // den == 4: 2x2 box filter, edge rows/cols clamp
      for (int r = 0; r < nc; r += 2) {
        const uint8_t* us0 = urows[r];
        const uint8_t* vs0 = vrows[r];
        const uint8_t* us1 = (r + 1 < nc) ? urows[r + 1] : urows[r];
        const uint8_t* vs1 = (r + 1 < nc) ? vrows[r + 1] : vrows[r];
        uint8_t* dst =
            uv + static_cast<int64_t>((crow0 + r) / 2) * cw_out * 2;
        for (int x = 0; x < cw_out; ++x) {
          const int x0 = 2 * x;
          const int x1 = (x0 + 1 < cw) ? x0 + 1 : x0;
          dst[2 * x] = static_cast<uint8_t>(
              (us0[x0] + us0[x1] + us1[x0] + us1[x1] + 2) >> 2);
          dst[2 * x + 1] = static_cast<uint8_t>(
              (vs0[x0] + vs0[x1] + vs1[x0] + vs1[x1] + 2) >> 2);
        }
      }
    }
    row += ny;
  }

  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"

"""Minimal H.264/AVC Annex-B BITSTREAM-LEVEL codec — stdlib only.

Scope, from the public spec (ISO/IEC 14496-10 / ITU-T H.264):

- mux (`annexb_encode`): a conforming Annex-B byte stream — 4-byte start
  codes, a REAL baseline-profile SPS NAL (exp-Golomb syntax, §7.3.2.1,
  including frame cropping for non-multiple-of-16 dims and VUI
  timing_info carrying the frame rate), a minimal PPS NAL, and one IDR
  VCL NAL per frame whose slice payload is a deterministic opaque
  pattern (macroblock-level entropy decode is out of in-sandbox scope,
  exactly like the Opus packet bodies in gx_spark/oggopus.py).
- demux (`annexb_parse`): start-code scan, RBSP emulation-prevention
  de-escaping, full SPS parse (profile/level, chroma high-profile
  branch, pic order cnt types 0/1/2, cropping, VUI timing) → width,
  height, fps, plus a VCL-NAL frame count.

So a bare-'h264' video row is now verified at the BITSTREAM level:
header syntax, SPS-declared dimensions vs the metadata columns, VUI
frame rate and frame count vs n_frames/fps — only the slice macroblock
data itself stays un-decoded.  Decided r5 (SURVEY.md §2.5): slice
decode is OUT OF SCOPE permanently, same rationale as the Opus
CELT/SILK stance — the in-sandbox fixtures carry deterministic opaque
slice payloads (no AVC encoder exists here to produce real CAVLC/CABAC
residuals), so a from-scratch slice decoder could never be exercised
against real content and would add no validation power.

No upstream analog (reference mount empty; SURVEY.md §0).
"""

from __future__ import annotations

_START = b"\x00\x00\x00\x01"


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:  # Exp-Golomb, §9.1
        v = value + 1
        n = v.bit_length()
        self.bits.extend([0] * (n - 1))
        self.u(v, n)

    def rbsp_trailing(self) -> None:  # §7.3.2.11
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i:i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


class _BitReader:
    def __init__(self, b: bytes) -> None:
        self.b = b
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.b):
                raise ValueError("SPS truncated mid-field")
            v = (v << 1) | ((self.b[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad exp-golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _escape_rbsp(payload: bytes) -> bytes:
    """Insert emulation-prevention bytes (§7.4.1.1): 00 00 0x -> 00 00 03 0x."""
    out = bytearray()
    zeros = 0
    for byte in payload:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    return bytes(out)


def _unescape_rbsp(payload: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(payload):
        byte = payload[i]
        if zeros >= 2 and byte == 3 and i + 1 < len(payload) \
                and payload[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
        i += 1
    return bytes(out)


def sps_encode(width: int, height: int, fps: float,
               profile_idc: int = 66, level_idc: int = 30) -> bytes:
    """Baseline-profile SPS RBSP (§7.3.2.1.1) declaring `width`x`height`
    at `fps`, cropping down from the macroblock grid when the dims are
    not multiples of 16.  pic_order_cnt_type=2 (the decode==display
    order case — no extra syntax)."""
    if width <= 0 or height <= 0 or fps <= 0:
        raise ValueError("positive dims and fps required")
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    crop_r = (mb_w * 16 - width) // 2   # CropUnitX = 2 (4:2:0)
    crop_b = (mb_h * 16 - height) // 2  # CropUnitY = 2 (frame_mbs_only)
    if (mb_w * 16 - width) % 2 or (mb_h * 16 - height) % 2:
        raise ValueError("dims must be even (4:2:0 crop units)")
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)                 # constraint flags + reserved_zero_2bits
    w.u(level_idc, 8)
    w.ue(0)                   # seq_parameter_set_id
    w.ue(4)                   # log2_max_frame_num_minus4 -> 8 bits
    w.ue(2)                   # pic_order_cnt_type
    w.ue(1)                   # max_num_ref_frames
    w.u(0, 1)                 # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)            # pic_width_in_mbs_minus1
    w.ue(mb_h - 1)            # pic_height_in_map_units_minus1
    w.u(1, 1)                 # frame_mbs_only_flag
    w.u(0, 1)                 # direct_8x8_inference_flag
    cropping = crop_r or crop_b
    w.u(1 if cropping else 0, 1)
    if cropping:
        w.ue(0)               # left
        w.ue(crop_r)          # right
        w.ue(0)               # top
        w.ue(crop_b)          # bottom
    # VUI with timing_info so the frame rate is bitstream-declared
    w.u(1, 1)                 # vui_parameters_present_flag
    w.u(0, 1)                 # aspect_ratio_info_present_flag
    w.u(0, 1)                 # overscan_info_present_flag
    w.u(0, 1)                 # video_signal_type_present_flag
    w.u(0, 1)                 # chroma_loc_info_present_flag
    w.u(1, 1)                 # timing_info_present_flag
    num_units = 1000
    time_scale = int(round(fps * 2 * num_units))  # §E.2.1: 2 ticks/frame
    w.u(num_units, 32)
    w.u(time_scale, 32)
    w.u(1, 1)                 # fixed_frame_rate_flag
    w.u(0, 1)                 # nal_hrd_parameters_present_flag
    w.u(0, 1)                 # vcl_hrd_parameters_present_flag
    w.u(0, 1)                 # pic_struct_present_flag
    w.u(0, 1)                 # bitstream_restriction_flag
    w.rbsp_trailing()
    return b"\x67" + _escape_rbsp(w.bytes())  # nal_ref_idc=3, type=7


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128,
                  138, 139, 134, 135}


def sps_parse(nal: bytes) -> dict:
    """Parse an SPS NAL (header byte + RBSP) → {"width","height","fps",
    "profile_idc","level_idc"}.  fps is None without VUI timing info.
    Implements the §7.3.2.1.1 syntax including the high-profile chroma
    branch and all three pic_order_cnt_types; raises ValueError on
    malformed input."""
    if len(nal) < 4 or (nal[0] & 0x1F) != 7:
        raise ValueError("not an SPS NAL")
    r = _BitReader(_unescape_rbsp(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)                    # constraint flags
    level_idc = r.u(8)
    r.ue()                    # seq_parameter_set_id
    chroma_format_idc = 1
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        r.ue()                # bit_depth_luma_minus8
        r.ue()                # bit_depth_chroma_minus8
        r.u(1)                # qpprime_y_zero_transform_bypass_flag
        if r.u(1):            # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):    # seq_scaling_list_present_flag[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()                    # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()                # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)                # delta_pic_order_always_zero_flag
        r.se()                # offset_for_non_ref_pic
        r.se()                # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()            # offset_for_ref_frame[i]
    elif poc_type != 2:
        raise ValueError(f"bad pic_order_cnt_type {poc_type}")
    r.ue()                    # max_num_ref_frames
    r.u(1)                    # gaps_in_frame_num_value_allowed_flag
    mb_w = r.ue() + 1
    map_units_h = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)                # mb_adaptive_frame_field_flag
    r.u(1)                    # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):                # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    fps = None
    if r.u(1):                # vui_parameters_present_flag
        if r.u(1):            # aspect_ratio_info_present_flag
            if r.u(8) == 255:  # Extended_SAR
                r.u(32)
        if r.u(1):            # overscan_info_present_flag
            r.u(1)
        if r.u(1):            # video_signal_type_present_flag
            r.u(4)            # format(3) + full_range(1)
            if r.u(1):        # colour_description_present_flag
                r.u(24)
        if r.u(1):            # chroma_loc_info_present_flag
            r.ue()
            r.ue()
        if r.u(1):            # timing_info_present_flag
            num_units = r.u(32)
            time_scale = r.u(32)
            if num_units == 0 or time_scale == 0:
                raise ValueError("bad VUI timing info")
            fps = time_scale / (2.0 * num_units)
    # §7.4.2.1.1 frame size derivation (frame_mbs_only assumed for height)
    if chroma_format_idc == 0 or separate_colour_plane:
        cux, cuy = 1, 2 - frame_mbs_only
    elif chroma_format_idc == 1:
        cux, cuy = 2, 2 * (2 - frame_mbs_only)
    elif chroma_format_idc == 2:
        cux, cuy = 2, 1 * (2 - frame_mbs_only)
    else:
        cux, cuy = 1, 1 * (2 - frame_mbs_only)
    width = mb_w * 16 - cux * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * map_units_h * 16 - cuy * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise ValueError("crop exceeds coded size")
    return {"width": width, "height": height, "fps": fps,
            "profile_idc": profile_idc, "level_idc": level_idc}


def annexb_encode(vid_id: str, n_frames: int, fps: float,
                  width: int, height: int) -> bytes:
    """Annex-B stream: SPS + PPS + one IDR NAL per frame (opaque
    deterministic slice payload, one slice per frame by construction)."""
    import zlib

    sps = sps_encode(width, height, fps)
    pps_w = _BitWriter()
    pps_w.ue(0)               # pic_parameter_set_id
    pps_w.ue(0)               # seq_parameter_set_id
    pps_w.u(0, 1)             # entropy_coding_mode_flag (CAVLC)
    pps_w.u(0, 1)             # bottom_field_pic_order_in_frame_present
    pps_w.ue(0)               # num_slice_groups_minus1
    pps_w.ue(0)               # num_ref_idx_l0_default_active_minus1
    pps_w.ue(0)               # num_ref_idx_l1_default_active_minus1
    pps_w.u(0, 1)             # weighted_pred_flag
    pps_w.u(0, 2)             # weighted_bipred_idc
    pps_w.bits.append(1)      # pic_init_qp_minus26 = 0 (se: bit '1')
    pps_w.bits.append(1)      # pic_init_qs_minus26 = 0
    pps_w.bits.append(1)      # chroma_qp_index_offset = 0
    pps_w.u(0, 1)             # deblocking_filter_control_present_flag
    pps_w.u(0, 1)             # constrained_intra_pred_flag
    pps_w.u(0, 1)             # redundant_pic_cnt_present_flag
    pps_w.rbsp_trailing()
    pps = b"\x68" + _escape_rbsp(pps_w.bytes())
    out = bytearray(_START + sps + _START + pps)
    seed = zlib.crc32((vid_id + "h264").encode()) & 0xFFFFFFFF
    for i in range(max(1, int(n_frames))):
        body = ((seed + i) % 251 + 1).to_bytes(1, "big") * 24
        # 0x65: nal_ref_idc=3, nal_unit_type=5 (IDR slice)
        out += _START + b"\x65" + _escape_rbsp(body)
    return bytes(out)


def annexb_parse(b: bytes) -> dict:
    """Demux + verify an Annex-B stream: start-code walk, one SPS
    required before the first VCL NAL, SPS fully parsed, VCL NALs counted
    as frames (one slice per frame — the generator's convention, stated
    in annexb_encode).  Returns {"width","height","fps","n_frames",
    "profile_idc","level_idc"}; raises ValueError when malformed."""
    if len(b) < 5:
        raise ValueError("too short for a NAL")
    # accept 3- or 4-byte start codes
    positions = []
    i = 0
    n = len(b)
    while i + 3 <= n:
        if b[i] == 0 and b[i + 1] == 0:
            if b[i + 2] == 1:
                positions.append((i, i + 3))
                i += 3
                continue
            if i + 4 <= n and b[i + 2] == 0 and b[i + 3] == 1:
                positions.append((i, i + 4))
                i += 4
                continue
        i += 1
    if not positions or positions[0][0] != 0:
        raise ValueError("stream must begin with a start code")
    sps_info = None
    n_vcl = 0
    for j, (s, payload_start) in enumerate(positions):
        end = positions[j + 1][0] if j + 1 < len(positions) else n
        nal = b[payload_start:end]
        if not nal:
            raise ValueError("empty NAL unit")
        if nal[0] & 0x80:
            raise ValueError("forbidden_zero_bit set")
        ntype = nal[0] & 0x1F
        if ntype == 7:
            sps_info = sps_parse(nal)
        elif ntype in (1, 5):
            if sps_info is None:
                raise ValueError("VCL NAL before SPS")
            n_vcl += 1
    if sps_info is None or n_vcl == 0:
        raise ValueError("missing SPS or no coded frames")
    return {**sps_info, "n_frames": n_vcl}

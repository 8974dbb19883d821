package sbspark;

import java.io.IOException;
import java.util.ArrayList;
import java.util.List;

/**
 * Scan-time hit validation for loose signatures (round 13).
 *
 * Some header patterns carry almost no information (mp3's 11-bit frame
 * sync, bmp's 2-byte "BM", ico's low-entropy 00 00 0x 00), so evidence
 * scans emit thousands of false hits per GiB for a handful of real
 * files — rows that are shipped, shuffled and Python-crossed into the
 * carve stage just to be rejected by the handler's first header reads.
 * Each gate here hoists a PREFIX of its carver's rejection cascade to
 * hit time:
 *
 *   m3  — the carver's 3-consecutive-valid-frames rule for bare-sync
 *         mp3 starts (carvers/media.py carve_mp3; the reference's own
 *         rule, src/carve/mp3.rs:189-330). ID3v2-headed hits are never
 *         gated.
 *   bm  — carve_bmp's full header validation (carvers/images.py
 *         carve_bmp; reference src/carve/bmp.rs:54-192): size/offset
 *         arithmetic, DIB size table, dimension and bpp plausibility.
 *         The rule is a pure function of one 58-byte read, so the
 *         whole cascade hoists.
 *   ic  — the cheap prefix of carve_ico (carvers/images.py carve_ico):
 *         directory count bounds and first-entry sanity. Only the
 *         prefix hoists (full validation reads every directory
 *         entry's image header); a gate-kept false positive still
 *         dies at carve time.
 *
 * Drop soundness: a gate drops a hit only when the evidence bytes
 * prove the carver would return None — every check is byte-for-byte a
 * prefix of the Python handler's own cascade over the same absolute
 * offsets, and a short read at evidence EOF rejects in both. Window
 * caps and max_size can only make the CARVER stricter, never the gate,
 * so carved rows are identical with gates on or off (pytest-pinned,
 * tests/test_mp3_gate.py + tests/test_scan_gates.py).
 */
final class ScanGates {

  /** Positioned-read view of the evidence (raw channel, EWF, or a preloaded block). */
  interface ReadAt {
    byte[] read(long pos, int len) throws IOException;
  }

  static final byte NONE = 0;
  static final byte MP3 = 1;
  static final byte BMP = 2;
  static final byte ICO = 3;

  static byte kindFor(String tag) {
    switch (tag) {
      case "m3":
        return MP3;
      case "bm":
        return BMP;
      case "ic":
        return ICO;
      default:
        throw new IllegalArgumentException("unknown scan-gate tag: " + tag);
    }
  }

  // --- mp3 -------------------------------------------------------------

  private static final int[] BITRATES_V1_L3 = {
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0
  };
  private static final int[] BITRATES_V2_L3 = {
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0
  };
  private static final int[][] SAMPLE_RATES = {
    {11025, 12000, 8000, 0}, // MPEG 2.5
    {0, 0, 0, 0}, // reserved
    {22050, 24000, 16000, 0}, // MPEG 2
    {44100, 48000, 32000, 0}, // MPEG 1
  };

  /** Frame byte length from a 4-byte header, or -1 — mirrors carvers/media.py _mp3_frame_size. */
  static int frameSize(byte[] h) {
    if (h.length < 4) return -1;
    int b0 = h[0] & 0xFF, b1 = h[1] & 0xFF, b2 = h[2] & 0xFF;
    if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return -1;
    int version = (b1 >> 3) & 0x03;
    int layer = (b1 >> 1) & 0x03;
    int bitrateIdx = (b2 >> 4) & 0x0F;
    int rateIdx = (b2 >> 2) & 0x03;
    int padding = (b2 >> 1) & 0x01;
    if (version == 1 || layer == 0 || bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) {
      return -1;
    }
    int sampleRate = SAMPLE_RATES[version][rateIdx];
    if (sampleRate == 0) return -1;
    int bitrate = (version == 3 ? BITRATES_V1_L3 : BITRATES_V2_L3)[bitrateIdx];
    if (bitrate == 0) return -1;
    if (layer == 3) { // Layer I
      return (12 * bitrate * 1000 / sampleRate + padding) * 4;
    }
    int slot = version == 3 ? 144 : 72;
    return slot * bitrate * 1000 / sampleRate + padding;
  }

  /** The carver's 3-consecutive-valid-frames precheck at absolute offset `off`. */
  static boolean mp3Valid(ReadAt src, long off) throws IOException {
    byte[] h = src.read(off, 4);
    int f1 = frameSize(h);
    if (f1 < 0) return false;
    long total = f1;
    int frames = 1;
    while (frames < 3) {
      byte[] fh = src.read(off + total, 4);
      if (fh.length < 4) return false; // evidence EOF inside the walk
      if (fh[0] == 'T' && fh[1] == 'A' && fh[2] == 'G') return false; // ID3v1: stream over
      int s = frameSize(fh);
      if (s < 0) return false;
      total += s;
      frames++;
    }
    return true;
  }

  // --- bmp -------------------------------------------------------------

  private static final long BMP_MAX_DIM = 32768; // carvers/images.py _BMP_MAX_DIM

  private static boolean validDib(long dib) {
    // carvers/images.py _VALID_DIB_SIZES
    return dib == 12 || dib == 40 || dib == 52 || dib == 56 || dib == 108 || dib == 124;
  }

  private static long u32(byte[] h, int i) {
    return (h[i] & 0xFFL)
        | ((h[i + 1] & 0xFFL) << 8)
        | ((h[i + 2] & 0xFFL) << 16)
        | ((h[i + 3] & 0xFFL) << 24);
  }

  private static int i32(byte[] h, int i) {
    return (int) u32(h, i);
  }

  private static int u16(byte[] h, int i) {
    return (h[i] & 0xFF) | ((h[i + 1] & 0xFF) << 8);
  }

  /**
   * carve_bmp's full header cascade — byte-for-byte the Python handler's
   * checks — plus (r14) the pipeline's min-size rejection hoisted from
   * finalize() (carvers/base.py:219): the carved size is
   * min(declared fileSize, max_size truncation, EOF clamp), which can
   * only SHRINK fileSize, so fileSize &lt; minSize proves finalize
   * would return None. minSize 0 (no param in the spec) disables the
   * check.
   */
  static boolean bmpValid(ReadAt src, long off, long minSize) throws IOException {
    byte[] h = src.read(off, 58);
    if (h.length < 18 || h[0] != 'B' || h[1] != 'M') return false;
    long fileSize = u32(h, 2);
    long pixelOffset = u32(h, 10);
    if (fileSize < 14 || fileSize < pixelOffset) return false;
    if (fileSize < minSize) return false;
    long dib = u32(h, 14);
    if (!validDib(dib)) return false;
    if (pixelOffset < 14 + dib) return false;
    if (dib >= 40 && h.length >= 26) {
      int width = i32(h, 18);
      int height = i32(h, 22);
      long aw = Math.abs((long) width);
      long ah = Math.abs((long) height);
      if (width <= 0 || aw > BMP_MAX_DIM || ah > BMP_MAX_DIM) return false;
      if (h.length >= 30) {
        int bpp = u16(h, 28);
        if (bpp != 1 && bpp != 4 && bpp != 8 && bpp != 16 && bpp != 24 && bpp != 32) {
          return false;
        }
        long row = ((aw * bpp + 31) / 32) * 4;
        if (fileSize < Math.max(0, pixelOffset + row * ah - 1024)) return false;
      }
    }
    return true;
  }

  // --- ico -------------------------------------------------------------

  private static final int ICO_MAX_ENTRIES = 64; // carvers/images.py _ICO_MAX_ENTRIES
  private static final long ICO_MAX_IMAGE = 512 * 1024; // _ICO_MAX_IMAGE

  /** Prefix of carve_ico's cascade: count bounds + first directory entry sanity. */
  static boolean icoPrefixValid(ReadAt src, long off) throws IOException {
    byte[] h = src.read(off, 6);
    if (h.length < 6) return false;
    // reserved==0 and icon_type in (1,2) are guaranteed by the hit patterns
    int count = u16(h, 4);
    if (count == 0 || count > ICO_MAX_ENTRIES) return false;
    byte[] d = src.read(off + 6, 16);
    if (d.length < 16) return false;
    long size = u32(d, 8);
    long imgOff = u32(d, 12);
    long dirSize = 6 + count * 16L;
    if (size == 0 || imgOff < dirSize || size > ICO_MAX_IMAGE) return false;
    return true;
  }

  // --- dispatch ---------------------------------------------------------

  static boolean valid(byte kind, ReadAt src, long off, long param) throws IOException {
    switch (kind) {
      case MP3:
        return mp3Valid(src, off);
      case BMP:
        return bmpValid(src, off, param);
      case ICO:
        return icoPrefixValid(src, off);
      default:
        return true;
    }
  }

  /**
   * Filter packed (localOffset &lt;&lt; 16 | patIdx) hits: gated pattern
   * indices keep only offsets passing their gate (absolute offset =
   * regionStart + localOffset). Hits at localOffset &gt;= validLimit
   * are passed through UNvalidated: normalize_hits discards the
   * overlap tail anyway, so validating there would pay lookahead
   * reads (chunk decompressions on E01) for rows that never reach
   * the carve stage — callers without a known valid length pass
   * Long.MAX_VALUE. No-op unless the spec flagged any pattern.
   */
  static List<Long> filter(Ac ac, ReadAt src, long regionStart, List<Long> hits, long validLimit)
      throws IOException {
    if (!ac.anyGate || hits.isEmpty()) return hits;
    List<Long> kept = new ArrayList<>(hits.size());
    for (long h : hits) {
      int idx = (int) (h & 0xFFFF);
      byte kind = ac.gateKind[idx];
      long off = h >> 16;
      if (kind == NONE
          || off >= validLimit
          || valid(kind, src, regionStart + off, ac.gateParam[idx])) {
        kept.add(h);
      }
    }
    return kept;
  }

  private ScanGates() {}
}

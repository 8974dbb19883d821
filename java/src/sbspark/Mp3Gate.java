package sbspark;

import java.io.IOException;
import java.util.ArrayList;
import java.util.List;

/**
 * Scan-time MP3 bare-sync validation (round 13).
 *
 * The mp3 frame-sync patterns (FF FB / FF FA) are only 11 effective
 * bits, so signature scans over random or text-dense evidence emit
 * ~10k false mp3 hits per GiB for a handful of real files — the top
 * aggregate carve term in the per-format profile. The carver already
 * rejects bare-sync starts that lack 3 consecutive valid frame
 * headers (swiftbeaver_spark/carvers/media.py carve_mp3; the
 * reference's own rule, src/carve/mp3.rs:189-330). Hoisting exactly
 * that precheck to hit time drops the false positives BEFORE they are
 * shipped, shuffled and Python-crossed into the carve stage.
 *
 * Drop soundness: the gate drops a hit only when the evidence bytes
 * themselves prove the carver would return None — an invalid frame
 * header among the first 3 frames, a TAG marker inside them, or
 * evidence EOF before the third header (read_exact -> None in the
 * carver). Window caps and max_size limits can only make the CARVER
 * stricter than the gate, never the reverse, so every gate-kept
 * false positive still dies at carve time and carved rows are
 * byte-identical with the gate on or off (pytest-pinned).
 *
 * ID3v2-headed hits ("ID3") are never gated: the carver validates
 * those by the tag itself (started_with_id3).
 */
final class Mp3Gate {

  /** Positioned-read view of the evidence (raw channel, EWF, or a preloaded block). */
  interface ReadAt {
    byte[] read(long pos, int len) throws IOException;
  }

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
  static boolean syncValid(ReadAt src, long off) throws IOException {
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

  /**
   * Filter packed (localOffset &lt;&lt; 16 | patIdx) hits: gated pattern
   * indices keep only offsets passing syncValid (absolute offset =
   * regionStart + localOffset). No-op unless the spec flagged any
   * pattern.
   */
  static List<Long> filter(Ac ac, ReadAt src, long regionStart, List<Long> hits)
      throws IOException {
    if (!ac.anyMp3Gate || hits.isEmpty()) return hits;
    List<Long> kept = new ArrayList<>(hits.size());
    for (long h : hits) {
      int idx = (int) (h & 0xFFFF);
      if (!ac.mp3Gate[idx] || syncValid(src, regionStart + (h >> 16))) {
        kept.add(h);
      }
    }
    return kept;
  }

  private Mp3Gate() {}
}

package sbspark;

import java.io.IOException;
import java.nio.ByteBuffer;
import java.nio.channels.FileChannel;
import java.nio.file.Paths;
import java.nio.file.StandardOpenOption;
import java.util.List;
import java.util.concurrent.ConcurrentHashMap;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.api.java.UDF4;

/**
 * sb_scan_strings(path, start, valid_length, spec) -> array&lt;struct&gt;.
 *
 * Fused positioned-read + span scan for one sub-chunk of an evidence
 * file (raw or EWF/E01), continuation-aware: window extends backward
 * to a run barrier and UTF-8 runs extend forward to their structural
 * end, so rows are pinned to the cfg.chunk_size geometry regardless of
 * the planning granule — the same semantics as the Python kernel's
 * _subchunk_spans (differential-fuzz-pinned).
 */
public class StringScanEvidenceUdf implements UDF4<String, Long, Long, String, List<Row>> {
  private static final ConcurrentHashMap<String, Boolean> IS_EWF = new ConcurrentHashMap<>();

  private static final class RawIo implements Strs.Io {
    private final FileChannel ch;

    RawIo(FileChannel ch) {
      this.ch = ch;
    }

    @Override
    public byte[] read(long pos, int len) throws IOException {
      byte[] out = new byte[len];
      ByteBuffer bb = ByteBuffer.wrap(out);
      int got = 0;
      while (got < len) {
        int n = ch.read(bb, pos + got);
        if (n <= 0) break;
        got += n;
      }
      return got == len ? out : java.util.Arrays.copyOfRange(out, 0, got);
    }
  }

  private static final class EwfIo implements Strs.Io {
    private final EwfImage img;

    EwfIo(EwfImage img) {
      this.img = img;
    }

    @Override
    public byte[] read(long pos, int len) throws IOException {
      return img.readAt(pos, len);
    }
  }

  @Override
  public List<Row> call(String path, Long start, Long validLength, String spec)
      throws Exception {
    Strs s = Strs.get(spec);
    Boolean ewf = IS_EWF.get(path);
    if (ewf == null) {
      ewf = EwfImage.isEwf(path);
      IS_EWF.putIfAbsent(path, ewf);
    }
    if (ewf) {
      EwfImage img = EwfImage.get(path);
      return s.scanEvidence(new EwfIo(img), img.mediaSize, start, validLength);
    }
    // per-call channel: each call scans a whole sub-chunk (>= MiBs),
    // which amortizes the open; an unbounded per-path cache would leak
    // one fd per evidence file for the executor lifetime (round-10
    // self-review — a directory sweep over thousands of images hits
    // ulimit). EwfImage stays cached: its value is the parsed chunk
    // TABLE, and image counts are small.
    try (FileChannel ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)) {
      return s.scanEvidence(new RawIo(ch), ch.size(), start, validLength);
    }
  }
}

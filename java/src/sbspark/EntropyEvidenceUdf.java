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
 * sb_entropy(path, start, valid_length, spec) -&gt; array&lt;struct&gt;.
 *
 * Fused positioned-read + entropy window scan for one sub-chunk of an
 * evidence file (raw or EWF/E01) — the evidence-path twin of
 * EntropyBytesUdf. Windows are independent (no continuation machinery:
 * the grid is globally window-aligned because the Python planner
 * rounds the granule to a window_size multiple), so each call just
 * reads its range in window-aligned blocks and folds.
 */
public class EntropyEvidenceUdf implements UDF4<String, Long, Long, String, List<Row>> {
  private static final ConcurrentHashMap<String, Boolean> IS_EWF = new ConcurrentHashMap<>();

  private static final class RawIo implements Ent.Io {
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

  private static final class EwfIo implements Ent.Io {
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
    Ent e = Ent.get(spec);
    Boolean ewf = IS_EWF.get(path);
    if (ewf == null) {
      ewf = EwfImage.isEwf(path);
      IS_EWF.putIfAbsent(path, ewf);
    }
    if (ewf) {
      EwfImage img = EwfImage.get(path);
      return e.scanEvidence(new EwfIo(img), img.mediaSize, start, validLength);
    }
    // per-call channel, same rationale as StringScanEvidenceUdf: one
    // call scans a whole sub-chunk, amortizing the open; an unbounded
    // per-path channel cache would leak one fd per evidence file
    try (FileChannel ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)) {
      return e.scanEvidence(new RawIo(ch), ch.size(), start, validLength);
    }
  }
}

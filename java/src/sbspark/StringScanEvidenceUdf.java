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
  private static final ConcurrentHashMap<String, FileChannel> FILES = new ConcurrentHashMap<>();

  private static FileChannel channel(String path) throws IOException {
    FileChannel ch = FILES.get(path);
    if (ch == null) {
      ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ);
      FileChannel prev = FILES.putIfAbsent(path, ch);
      if (prev != null) {
        ch.close();
        ch = prev;
      }
    }
    return ch;
  }

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
    Strs.Io io;
    long total;
    if (ewf) {
      EwfImage img = EwfImage.get(path);
      io = new EwfIo(img);
      total = img.mediaSize;
    } else {
      FileChannel ch = channel(path);
      io = new RawIo(ch);
      total = ch.size();
    }
    return s.scanEvidence(io, total, start, validLength);
  }
}

package sbspark;

import java.util.List;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.api.java.UDF4;

/**
 * sb_entropy_bytes(data, start, valid_length, spec) -&gt; array&lt;struct&gt;.
 *
 * Windowed Shannon entropy over one chunk blob (the chunk-table path);
 * emits (win_start, win_end, entropy) for windows &gt;= threshold.
 * Bit-exact with the Python numpy fold (see Ent).
 */
public class EntropyBytesUdf implements UDF4<byte[], Long, Long, String, List<Row>> {
  @Override
  public List<Row> call(byte[] data, Long start, Long validLength, String spec) {
    return Ent.get(spec).scanBytes(data, start, validLength);
  }
}

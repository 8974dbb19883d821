package sbspark;

import java.util.List;
import org.apache.spark.sql.api.java.UDF2;

/** sb_scan_bytes(data, spec) -> array<bigint> of packed (off<<16|patIdx). */
public class ScanBytesUdf implements UDF2<byte[], String, List<Long>> {
  @Override
  public List<Long> call(byte[] data, String spec) {
    if (data == null) return new java.util.ArrayList<>();
    return Ac.get(spec).scanBytes(data);
  }
}

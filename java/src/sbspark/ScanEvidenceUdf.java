package sbspark;

import java.util.List;
import org.apache.spark.sql.api.java.UDF4;

/**
 * sb_scan_evidence(path, start, read_length, spec) -> array<bigint>.
 *
 * The fully-fused scan: positioned read + multi-pattern match in one
 * JVM pass — chunk bytes never enter Python and never materialise
 * beyond a 4 MiB streaming window, whatever the chunk size.
 */
public class ScanEvidenceUdf implements UDF4<String, Long, Long, String, List<Long>> {
  @Override
  public List<Long> call(String path, Long start, Long length, String spec) throws Exception {
    return Ac.get(spec).scanFile(path, start, length);
  }
}

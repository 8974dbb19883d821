package sbspark;

import java.util.List;
import java.util.concurrent.ConcurrentHashMap;
import org.apache.spark.sql.api.java.UDF4;

/**
 * sb_scan_evidence(path, start, read_length, spec) -> array<bigint>.
 *
 * The fully-fused scan: positioned read + multi-pattern match in one
 * JVM pass — chunk bytes never enter Python and never materialise
 * beyond a streaming window, whatever the chunk size. EWF/E01
 * containers (sniffed by signature, cached per path) decompress
 * chunk-by-chunk straight into the automaton.
 */
public class ScanEvidenceUdf implements UDF4<String, Long, Long, String, List<Long>> {
  private static final ConcurrentHashMap<String, Boolean> IS_EWF = new ConcurrentHashMap<>();

  @Override
  public List<Long> call(String path, Long start, Long length, String spec) throws Exception {
    Boolean ewf = IS_EWF.get(path);
    if (ewf == null) {
      ewf = EwfImage.isEwf(path);
      IS_EWF.putIfAbsent(path, ewf);
    }
    Ac ac = Ac.get(spec);
    // valid_length is not part of this UDF's signature (the plan drops
    // overlap-tail hits in normalize_hits), so no validLimit cutoff here
    if (ewf) {
      EwfImage img = EwfImage.get(path);
      return ScanGates.filter(ac, img::readAt, start, img.scan(ac, start, length), Long.MAX_VALUE);
    }
    return ScanGates.filter(
        ac,
        (pos, len) -> Ac.readAt(path, pos, len),
        start,
        ac.scanFile(path, start, length),
        Long.MAX_VALUE);
  }
}

package sbspark;

import java.util.List;
import java.util.concurrent.ConcurrentHashMap;
import org.apache.spark.sql.api.java.UDF5;

/**
 * sb_scan_evidence(path, start, read_length, valid_length, spec) -> array<bigint>.
 *
 * The fully-fused scan: positioned read + multi-pattern match in one
 * JVM pass — chunk bytes never enter Python and never materialise
 * beyond a streaming window, whatever the chunk size. EWF/E01
 * containers (sniffed by signature, cached per path) decompress
 * chunk-by-chunk straight into the automaton.
 *
 * valid_length bounds gate validation: hits in the overlap tail
 * (local offset >= valid_length) are dropped by normalize_hits
 * downstream, so validating them would pay lookahead preads (chunk
 * decompressions on E01) for rows that never reach the carve stage —
 * same rule as the one-pass path (ScanAllEvidenceUdf) and the Python
 * fallback (scanner.py fused()).
 */
public class ScanEvidenceUdf implements UDF5<String, Long, Long, Long, String, List<Long>> {
  private static final ConcurrentHashMap<String, Boolean> IS_EWF = new ConcurrentHashMap<>();

  @Override
  public List<Long> call(String path, Long start, Long length, Long validLength, String spec)
      throws Exception {
    Boolean ewf = IS_EWF.get(path);
    if (ewf == null) {
      ewf = EwfImage.isEwf(path);
      IS_EWF.putIfAbsent(path, ewf);
    }
    Ac ac = Ac.get(spec);
    long vlen = validLength == null ? Long.MAX_VALUE : validLength;
    if (ewf) {
      EwfImage img = EwfImage.get(path);
      return ScanGates.filter(ac, img::readAt, start, img.scan(ac, start, length), vlen);
    }
    return ScanGates.filter(
        ac,
        (pos, len) -> Ac.readAt(path, pos, len),
        start,
        ac.scanFile(path, start, length),
        vlen);
  }
}

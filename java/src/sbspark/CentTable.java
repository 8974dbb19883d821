package sbspark;

import java.util.concurrent.ConcurrentHashMap;

/**
 * Parsed centroid/codebook table for SqDistsUdf / DotsUdf: the table
 * travels in the plan as ONE string literal ("row;row;..." with
 * ','-joined repr(double) components — Double.parseDouble is the same
 * shortest-round-trip grammar, so values are bit-exact) and is parsed
 * once per executor per distinct spec. This replaces both the
 * py4j-built array<array<double>> literal (~2000 driver round-trips
 * per 16x64 table) and the per-row catalyst-array -> Seq boxing the
 * UDF converter would do.
 */
final class CentTable {
  private static final ConcurrentHashMap<String, double[][]> CACHE = new ConcurrentHashMap<>();

  private CentTable() {}

  static double[][] get(String spec) {
    return CACHE.computeIfAbsent(
        spec,
        s -> {
          String[] rows = s.split(";", -1);
          double[][] out = new double[rows.length][];
          for (int i = 0; i < rows.length; i++) {
            String[] comps = rows[i].split(",", -1);
            out[i] = new double[comps.length];
            for (int j = 0; j < comps.length; j++) {
              out[i][j] = Double.parseDouble(comps[j]);
            }
          }
          return out;
        });
  }
}

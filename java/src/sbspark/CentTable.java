package sbspark;

import java.util.concurrent.ConcurrentHashMap;

/**
 * Parsed centroid/codebook table for SqDistsUdf / DotsUdf: the table
 * travels in the plan as ONE string literal ("row;row;..." with
 * ','-joined repr(double) components — Double.parseDouble is the same
 * shortest-round-trip grammar, so values are bit-exact; Python's
 * inf/nan spellings are translated to Infinity/NaN by _centroid_spec)
 * and is parsed once per executor per distinct spec. This replaces
 * both the py4j-built array<array<double>> literal (~2000 driver
 * round-trips per 16x64 table) and the per-row catalyst-array -> Seq
 * boxing the UDF converter would do.
 *
 * The cache is BOUNDED: iterative trainers (ivf_train) produce a fresh
 * spec per iteration, and a long-lived executor would otherwise
 * accumulate one parsed table + ~20 KB key per iteration forever. Past
 * MAX_ENTRIES the cache is cleared (crude, but any live query re-seeds
 * its handful of specs on the next row at one parse each).
 */
final class CentTable {
  static final int MAX_ENTRIES = 256;
  private static final ConcurrentHashMap<String, double[][]> CACHE = new ConcurrentHashMap<>();

  private CentTable() {}

  static double[][] get(String spec) {
    double[][] hit = CACHE.get(spec);
    if (hit != null) return hit;
    if (CACHE.size() >= MAX_ENTRIES) CACHE.clear();
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

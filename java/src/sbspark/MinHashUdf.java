package sbspark;

import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.HashSet;
import java.util.List;
import java.util.concurrent.ConcurrentHashMap;
import java.util.zip.CRC32;
import org.apache.spark.sql.api.java.UDF2;

/**
 * sb_minhash(text, spec) -> array&lt;bigint&gt; minhash signature.
 *
 * Bit-exact JVM port of the engine's numpy minhash kernel
 * (swiftbeaver_spark/llm/dedup.py minhash_signatures): normalize
 * (lowercase, collapse whitespace), distinct k-codepoint shingles,
 * CRC32 base hash (java.util.zip.CRC32 == zlib.crc32), then per hash
 * function min over (a_i * h + b_i) with uint64 wraparound (Java long
 * arithmetic wraps identically; the min is unsigned). Seeds arrive in
 * the spec so the JVM and numpy paths share one hash family:
 * "k;a1,a2,...;b1,b2,..." with unsigned-decimal seeds.
 *
 * Returns null for docs whose normalized text is empty (the Python
 * kernel drops those rows; callers filter nulls).
 */
public class MinHashUdf implements UDF2<String, String, List<Long>> {
  private static final ConcurrentHashMap<String, long[][]> SEEDS = new ConcurrentHashMap<>();

  private static long[][] seeds(String spec) {
    long[][] s = SEEDS.get(spec);
    if (s == null) {
      String[] parts = spec.split(";");
      String[] as = parts[1].split(",");
      String[] bs = parts[2].split(",");
      s = new long[3][];
      s[0] = new long[] {Long.parseLong(parts[0])}; // shingle k
      s[1] = new long[as.length];
      s[2] = new long[bs.length];
      for (int i = 0; i < as.length; i++) s[1][i] = Long.parseUnsignedLong(as[i]);
      for (int i = 0; i < bs.length; i++) s[2][i] = Long.parseUnsignedLong(bs[i]);
      SEEDS.putIfAbsent(spec, s);
    }
    return s;
  }

  /** Python's " ".join(text.lower().split()): lowercase, split on
   * whitespace runs, single-space join. Character.isWhitespace misses
   * U+0085 (NEL) and U+00A0/U+2007/U+202F which Python's str.split
   * treats as whitespace — add them. */
  static String normalize(String text) {
    String lower = text.toLowerCase(java.util.Locale.ROOT);
    StringBuilder sb = new StringBuilder(lower.length());
    boolean inSpace = true; // leading whitespace is dropped
    for (int i = 0; i < lower.length(); ) {
      int cp = lower.codePointAt(i);
      boolean ws =
          Character.isWhitespace(cp)
              || cp == 0x0085
              || cp == 0x00A0
              || cp == 0x2007
              || cp == 0x202F;
      if (ws) {
        if (!inSpace) sb.append(' ');
        inSpace = true;
      } else {
        sb.appendCodePoint(cp);
        inSpace = false;
      }
      i += Character.charCount(cp);
    }
    int len = sb.length();
    if (len > 0 && sb.charAt(len - 1) == ' ') sb.setLength(len - 1);
    return sb.toString();
  }

  @Override
  public List<Long> call(String text, String spec) {
    if (text == null) return null;
    long[][] s = seeds(spec);
    int k = (int) s[0][0];
    long[] a = s[1], b = s[2];
    String norm = normalize(text);
    if (norm.isEmpty()) return null;
    // codepoint offsets so shingles match Python string slicing
    int n = norm.codePointCount(0, norm.length());
    int[] cpOff = new int[n + 1];
    int idx = 0;
    for (int i = 0; i < n; i++) {
      cpOff[i] = idx;
      idx = norm.offsetByCodePoints(idx, 1);
    }
    cpOff[n] = idx;
    int upper = Math.max(n - k + 1, 1);
    HashSet<Long> bases = new HashSet<>(upper * 2);
    CRC32 crc = new CRC32();
    for (int i = 0; i < upper; i++) {
      int end = Math.min(i + k, n);
      byte[] bytes = norm.substring(cpOff[i], cpOff[end]).getBytes(StandardCharsets.UTF_8);
      crc.reset();
      crc.update(bytes, 0, bytes.length);
      bases.add(crc.getValue()); // 0..2^32-1; distinct CRCs suffice for min
    }
    long[] mins = new long[a.length];
    java.util.Arrays.fill(mins, -1L); // unsigned max
    for (long h : bases) {
      for (int j = 0; j < a.length; j++) {
        long v = a[j] * h + b[j]; // wraps mod 2^64 == numpy uint64
        if (Long.compareUnsigned(v, mins[j]) < 0) mins[j] = v;
      }
    }
    List<Long> out = new ArrayList<>(mins.length);
    for (long m : mins) out.add(m);
    return out;
  }
}

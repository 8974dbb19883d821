package sbspark;

import java.nio.charset.StandardCharsets;
import java.util.zip.CRC32;
import org.apache.spark.sql.api.java.UDF1;

/**
 * sb_simhash(text) -> bigint: bit-exact JVM port of the numpy simhash
 * kernel (swiftbeaver_spark/llm/dedup.py simhash): tokens =
 * lowercase-whitespace-split (MinHashUdf.normalize's whitespace rules),
 * per token CRC32 mixed through splitmix64, one ±1 vote per bit, sign
 * bits packed LSB-first. Duplicate tokens vote multiply, exactly like
 * the numpy matrix. Null/empty text -> 0 (both kernels).
 */
public class SimHashUdf implements UDF1<String, Long> {
  static long mix(long z) {
    z += 0x9E3779B97F4A7C15L;
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
    return z ^ (z >>> 31);
  }

  @Override
  public Long call(String text) {
    if (text == null) return 0L;
    String norm = MinHashUdf.normalize(text);
    if (norm.isEmpty()) return 0L;
    int[] votes = new int[64];
    CRC32 crc = new CRC32();
    int start = 0;
    int n = norm.length();
    while (start < n) {
      int sp = norm.indexOf(' ', start);
      if (sp < 0) sp = n;
      byte[] tok = norm.substring(start, sp).getBytes(StandardCharsets.UTF_8);
      crc.reset();
      crc.update(tok, 0, tok.length);
      long h = mix(crc.getValue());
      for (int b = 0; b < 64; b++) {
        votes[b] += ((h >>> b) & 1L) != 0 ? 1 : -1;
      }
      start = sp + 1;
    }
    long packed = 0L;
    for (int b = 0; b < 64; b++) {
      if (votes[b] > 0) packed |= 1L << b;
    }
    return packed;
  }
}

package sbspark;

import java.util.HashSet;
import org.apache.spark.sql.api.java.UDF3;

/**
 * sb_jaccard(text_a, text_b, k) -> double: exact Jaccard similarity of
 * the two texts' distinct k-codepoint shingle sets.
 *
 * Bit-exact JVM twin of the Python verify in
 * swiftbeaver_spark/llm/dedup.py (minhash_near_dups.verify): same
 * normalize (MinHashUdf.normalize == " ".join(text.lower().split())),
 * same codepoint-sliced shingles with the max(n-k+1, 1) floor, and the
 * same IEEE double division |A∩B| / |A∪B| — so moving the candidate
 * verify into the JVM changes which engine runs it, not any value it
 * produces. Null/empty-normalized inputs verify as 0.0 (such docs have
 * no signature row, so candidate pairs never contain them; the guard
 * is belt-and-braces for direct callers).
 */
public class JaccardUdf implements UDF3<String, String, Integer, Double> {
  private static HashSet<String> shingles(String text, int k) {
    String norm = MinHashUdf.normalize(text);
    if (norm.isEmpty()) return new HashSet<>();
    int n = norm.codePointCount(0, norm.length());
    int[] cpOff = new int[n + 1];
    int idx = 0;
    for (int i = 0; i < n; i++) {
      cpOff[i] = idx;
      idx = norm.offsetByCodePoints(idx, 1);
    }
    cpOff[n] = idx;
    int upper = Math.max(n - k + 1, 1);
    HashSet<String> out = new HashSet<>(upper * 2);
    for (int i = 0; i < upper; i++) {
      int end = Math.min(i + k, n);
      out.add(norm.substring(cpOff[i], cpOff[end]));
    }
    return out;
  }

  @Override
  public Double call(String a, String b, Integer k) {
    if (a == null || b == null) return 0.0;
    HashSet<String> sa = shingles(a, k);
    HashSet<String> sb = shingles(b, k);
    if (sa.isEmpty() && sb.isEmpty()) return 0.0;
    int inter = 0;
    HashSet<String> small = sa.size() <= sb.size() ? sa : sb;
    HashSet<String> big = small == sa ? sb : sa;
    for (String s : small) if (big.contains(s)) inter++;
    int union = sa.size() + sb.size() - inter;
    return union == 0 ? 0.0 : ((double) inter) / union;
  }
}

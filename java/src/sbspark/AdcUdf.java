package sbspark;

import org.apache.spark.sql.api.java.UDF3;
import scala.collection.Seq;

/**
 * sb_adc(lut, code, k) -> double: asymmetric-distance scoring of one
 * PQ code against a query's flat lookup table — the compiled twin of
 * _adc_score in swiftbeaver_spark/llm/similarity.py (aggregate over
 * sequence(0, m-1) of element_at(lut, j*k + code[j] + 1), interpreted
 * per candidate — the candidate-volume-driven q88/q120 hot loop).
 * m is derived as lut.length / k — the LUT is built as m*k entries by
 * _adc_lut, and the Catalyst twin iterates the CODEBOOK count, not the
 * code length — so a code with extra trailing entries has them ignored
 * (as Catalyst does) and a short/mismatched code folds to null (the
 * review-hardened defensive mirror of element_at's out-of-range null;
 * codes are exactly m entries in [0, k) by construction from
 * pq_encode). Same accumulation order (j ascending, acc + lookup);
 * null lut/code or a null code element folds to null.
 */
public class AdcUdf implements UDF3<Seq<Double>, Seq<Number>, Integer, Double> {
  @Override
  public Double call(Seq<Double> lut, Seq<Number> code, Integer k) {
    if (lut == null || code == null || k == null || k <= 0) return null;
    int m = lut.length() / k;
    if (code.length() < m) return null;
    double acc = 0.0;
    for (int j = 0; j < m; j++) {
      Number cj = code.apply(j);
      if (cj == null) return null;
      int idx = j * k + cj.intValue();
      if (idx < 0 || idx >= lut.length()) return null;
      Double entry = lut.apply(idx);
      if (entry == null) return null;
      acc = acc + entry;
    }
    return acc;
  }
}

package sbspark;

import org.apache.spark.sql.api.java.UDF3;
import scala.collection.Seq;

/**
 * sb_adc(lut, code, k) -> double: asymmetric-distance scoring of one
 * PQ code against a query's flat lookup table — the compiled twin of
 * _adc_score in swiftbeaver_spark/llm/similarity.py (aggregate over
 * sequence(0, m-1) of element_at(lut, j*k + code[j] + 1), interpreted
 * per candidate — the candidate-volume-driven q88/q120 hot loop).
 * Same accumulation order (j ascending, acc + lookup) and null
 * algebra: null lut/code or a null code element folds to null; an
 * out-of-range code index throws, as Catalyst element_at does under
 * ANSI — codes are in [0, k) by construction from pq_encode.
 */
public class AdcUdf implements UDF3<Seq<Double>, Seq<Number>, Integer, Double> {
  @Override
  public Double call(Seq<Double> lut, Seq<Number> code, Integer k) {
    if (lut == null || code == null || k == null) return null;
    double acc = 0.0;
    int m = code.length();
    for (int j = 0; j < m; j++) {
      Number cj = code.apply(j);
      if (cj == null) return null;
      Double entry = lut.apply(j * k + cj.intValue());
      if (entry == null) return null;
      acc = acc + entry;
    }
    return acc;
  }
}

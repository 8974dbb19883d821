package sbspark;

import java.util.ArrayList;
import java.util.List;
import org.apache.spark.sql.api.java.UDF2;
import scala.collection.Seq;

/**
 * sb_dots(vec, spec) -> array&lt;double&gt;: dot(vec, c) for every
 * centroid row of the CentTable spec — the compiled twin of _dots'
 * inner folds in swiftbeaver_spark/llm/similarity.py (the
 * dot-quantizer cell assignment). Rounding stays OUTSIDE in Catalyst
 * (F.round's BigDecimal HALF_UP over the k results — k ops per row,
 * not k x dim). DotUdf's exact IEEE order and per-entry null algebra.
 */
public class DotsUdf implements UDF2<Seq<Number>, String, List<Double>> {
  @Override
  public List<Double> call(Seq<Number> vec, String spec) {
    if (spec == null) return null;
    double[][] cents = CentTable.get(spec);
    List<Double> out = new ArrayList<>(cents.length);
    Double[] v = SqDistsUdf.unbox(vec);
    for (double[] c : cents) {
      out.add(dotRow(v, c));
    }
    return out;
  }

  static Double dotRow(Double[] vec, double[] c) {
    if (vec == null || vec.length != c.length) return null;
    double acc = 0.0;
    for (int i = 0; i < c.length; i++) {
      Double x = vec[i];
      if (x == null) return null;
      acc = acc + x * c[i];
    }
    return acc;
  }
}

package sbspark;

import java.util.ArrayList;
import java.util.List;
import org.apache.spark.sql.api.java.UDF2;
import scala.collection.Iterator;
import scala.collection.Seq;

/**
 * sb_sqdists(vec, spec) -> array&lt;double&gt;: squared L2 distance from
 * `vec` to every centroid row of the CentTable spec — the compiled
 * twin of _sq_dists in swiftbeaver_spark/llm/similarity.py (transform
 * over the centroid literal of an aggregate(zip_with((v-c)*(v-c)))
 * fold, interpreted per element). This is the IVF coarse-assignment /
 * PQ-encode hot loop: every corpus vector folds against k centroids x
 * dsub dims. Identical IEEE order ((v-c)*(v-c) per index, accumulate
 * left-to-right) and null algebra per ENTRY: null vec, null element,
 * or a dim mismatch with that centroid yields a null entry (the
 * transform element), never a null array. Elements widen from boxed
 * Number (see DotUdf on the array&lt;float&gt; caveat).
 */
public class SqDistsUdf implements UDF2<Seq<Number>, String, List<Double>> {
  @Override
  public List<Double> call(Seq<Number> vec, String spec) {
    if (spec == null) return null;
    double[][] cents = CentTable.get(spec);
    List<Double> out = new ArrayList<>(cents.length);
    Double[] v = unbox(vec);
    for (double[] c : cents) {
      out.add(sqdist(v, c));
    }
    return out;
  }

  /** One pass Seq -> Double[] (null-preserving, Number-widening); null vec -> null. */
  static Double[] unbox(Seq<Number> vec) {
    if (vec == null) return null;
    Double[] v = new Double[vec.length()];
    Iterator<Number> it = vec.iterator();
    for (int i = 0; it.hasNext(); i++) {
      Number x = it.next();
      v[i] = x == null ? null : x.doubleValue();
    }
    return v;
  }

  static Double sqdist(Double[] vec, double[] c) {
    if (vec == null || vec.length != c.length) return null;
    double acc = 0.0;
    for (int i = 0; i < c.length; i++) {
      Double x = vec[i];
      if (x == null) return null;
      double d = x - c[i];
      acc = acc + d * d;
    }
    return acc;
  }
}

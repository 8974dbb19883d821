package sbspark;

import org.apache.spark.sql.api.java.UDF2;
import scala.collection.Iterator;
import scala.collection.Seq;

/**
 * sb_dot(a, b) -> double: compiled left-fold dot product, bit-exact
 * twin of the Catalyst chain in swiftbeaver_spark/llm/similarity.py
 * (dot(): aggregate(zip_with(a, b, x*y), 0.0, acc+v) — higher-order
 * expressions are CodegenFallback-interpreted, so the per-element fold
 * dominated the brute-force/IVF walls). Same IEEE evaluation order
 * (multiply each pair, then accumulate left-to-right — javac/JIT may
 * not fuse into FMA, per JLS 15.17.1), and the same null algebra:
 * null array, any null element, or a length mismatch (zip_with pads
 * the shorter side with null) folds to null; two empty arrays fold to
 * the 0.0 init.
 */
public class DotUdf implements UDF2<Seq<Double>, Seq<Double>, Double> {
  @Override
  public Double call(Seq<Double> a, Seq<Double> b) {
    if (a == null || b == null || a.length() != b.length()) return null;
    double acc = 0.0;
    Iterator<Double> ia = a.iterator();
    Iterator<Double> ib = b.iterator();
    while (ia.hasNext()) {
      Double x = ia.next();
      Double y = ib.next();
      if (x == null || y == null) return null;
      acc = acc + x * y;
    }
    return acc;
  }
}

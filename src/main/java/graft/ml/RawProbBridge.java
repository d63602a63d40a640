package graft.ml;

import org.apache.spark.ml.classification.ProbabilisticClassificationModel;
import org.apache.spark.ml.linalg.Vector;

/**
 * Scala-`protected` members compile to public JVM bytecode, so Java may call
 * them where Scala may not. This shim reaches {@code raw2probabilityInPlace}
 * on an arbitrary fitted model so {@code SelfLabeledModel} can delegate
 * probability calibration to whatever base model it wraps (each family —
 * trees, NB, LR — calibrates raw scores differently; re-deriving that here
 * would silently diverge).
 */
public final class RawProbBridge {
  private RawProbBridge() {}

  public static Vector raw2probabilityInPlace(
      ProbabilisticClassificationModel<?, ?> model, Vector raw) {
    return model.raw2probabilityInPlace(raw);
  }
}

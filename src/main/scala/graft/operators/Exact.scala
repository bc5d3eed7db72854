package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** The exact-integer widening used by every cleared-fraction score in this
  * package (BM25, collocation lift, centroid distances): DECIMAL(38,0)
  * products stay exact to 10³⁸ where int64 would wrap silently, and the
  * final decimal→double casts round identically in every engine. ONE
  * definition — a per-operator copy of the cast is the same silent-drift
  * hazard as a second quantization formula ([[Embeddings.int8Code]]).
  */
private[operators] object Exact {
  val D38: DecimalType = DecimalType(38, 0)
  def dec(c: Column): Column = c.cast(D38)
}

package graft.queries

import graft.operators.Multimodal
import graft.functions.XSql.{Duck => SqlDuck}

/** Multimodal featurization as a catalog query. The payload is ASCII
  * text bytes (see [[Multimodal.mediaTable]]), so the oracle can state
  * the stub-decode result exactly in SQL: byte == codepoint.
  */
object MultimodalOps {

  val all: Seq[Q] = Seq(
    Q("m1_media_features",
      "binary media column -> mapPartitions featurizer (stub decode)",
      {
        implicit val dl: SqlDuck.type = SqlDuck
        val chars = dl.chars("text")
        val hist = dl.xform(dl.seq0("16"), "k_",
          s"cast(${dl.arrSize(dl.filt(chars, "c_", "unicode(c_) % 16 = k_"))} as bigint)")
        val sum = dl.foldL(dl.xform(chars, "c_", dl.codepoint("c_")), 0,
          "a_", "x_", "a_ + x_")
        s"""SELECT doc_id, cast(length(text) as bigint) AS n_bytes,
           |  array_to_string(list_transform($hist, x_ -> cast(x_ as varchar)), ',') AS byte_hist_csv,
           |  cast($sum as double) / cast(length(text) as double) AS mean_byte
           |FROM documents ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.functions._
      Multimodal.features(s, d)
        .select(col("doc_id"), col("n_bytes"),
          expr("array_join(transform(byte_hist, x_ -> cast(x_ as string)), ',')")
            .as("byte_hist_csv"),
          col("mean_byte"))
        .orderBy("doc_id")
    }
  )
}

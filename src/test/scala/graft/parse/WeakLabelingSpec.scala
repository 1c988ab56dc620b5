package graft.parse

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X7 semantics vectors, hand-derived from weak_labeling.py:21-41
  * (the reference module is dead code — its `clean_text` import does
  * not exist — so vectors are derived from the source, not executed). */
class WeakLabelingSpec extends SparkSpec {
  import spark.implicits._

  private def label(text: String,
      mah: Seq[String], il: Seq[String], ilce: Seq[String]): Seq[String] = {
    Seq(text).toDF("t")
      .select(WeakLabeling.weakBioLabels(col("t"), mah, il, ilce).as("l"))
      .head().getSeq[String](0)
  }

  test("basic gazetteer hits + O default") {
    assert(
      label("yildiz mahalle no 4 kadikoy istanbul",
        Seq("yildiz"), Seq("istanbul"), Seq("kadikoy")) ==
        Seq("B-MAHALLE", "O", "O", "O", "B-ILCE", "B-IL"))
  }

  test("mahalle wins over il/ilce (python continue)") {
    assert(label("istanbul", Seq("istanbul"), Seq("istanbul"), Seq("istanbul")) ==
      Seq("B-MAHALLE"))
  }

  test("token in both il and ilce ends B-ILCE (no continue after il loop)") {
    assert(label("bursa", Nil, Seq("bursa"), Seq("bursa")) == Seq("B-ILCE"))
    assert(label("bursa", Nil, Seq("bursa"), Nil) == Seq("B-IL"))
  }

  test("whitespace tokenization drops empties like python str.split()") {
    assert(label("  a   b  ", Nil, Nil, Nil) == Seq("O", "O"))
  }
}

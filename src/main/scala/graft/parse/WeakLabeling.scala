package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X7 — weak BIO labeling
  * (`/root/reference/addresskit/preprocessing/weak_labeling.py:21-41`,
  * dead code there: it imports a `clean_text` module that does not
  * exist; ported for capability parity with the gazetteer sets as
  * parameters instead of the external JSON files).
  *
  * Per whitespace token of the normalized text:
  *   - token in the mahalle index   → B-MAHALLE (and skip the rest —
  *     the python `continue`)
  *   - token an il (province) key   → B-IL
  *   - token an ilçe (district) key → B-ILCE — checked AFTER il with no
  *     `continue`, so a token that is both il and ilçe ends B-ILCE
  *     (the reference's own control flow; preserved verbatim)
  *   - otherwise                    → O
  *
  * Pure Column expression over literal arrays (the gazetteers are
  * small, constant-folded into codegen — the expression analogue of a
  * broadcast). One map-side pass; scales trivially.
  */
object WeakLabeling {

  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= "")

  def weakBioLabels(
      c: Column,
      mahalleIndex: Seq[String],
      ilKeys: Seq[String],
      ilceKeys: Seq[String]): Column = {
    val mah = lit(mahalleIndex.toArray)
    val il = lit(ilKeys.toArray)
    val ilce = lit(ilceKeys.toArray)
    transform(tokens(c), t =>
      when(array_contains(mah, t), "B-MAHALLE")
        .when(array_contains(ilce, t), "B-ILCE") // ilçe overwrites il
        .when(array_contains(il, t), "B-IL")
        .otherwise("O"))
  }
}

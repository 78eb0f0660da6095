package graft

import org.apache.spark.sql.functions._

import graft.resolve.Resolver
import graft.schema.ResolveConfig

/** Disposition semantics vs hand-computed expectations — the engine form of
  * the reference's process_duplicates / copy_to_all behavior
  * (duplicates_finder.py:180-214, worked example
  * tests/test_usecases_source_duplications.py:26-48). */
class ResolverSpec extends SparkSpec {
  import spark.implicits._

  // cluster 1: 2 scan + 2 ref; cluster 2: scan only; cluster 3: ref only;
  // cluster 4: 1 scan + 3 ref (copy_to_all exercises surplus refs)
  private lazy val members = Seq(
    ("s11", "scan", 1L), ("s12", "scan", 1L), ("r11", "ref", 1L), ("r12", "ref", 1L),
    ("s21", "scan", 2L), ("s22", "scan", 2L),
    ("r31", "ref", 3L),
    ("s41", "scan", 4L), ("r41", "ref", 4L), ("r42", "ref", 4L), ("r43", "ref", 4L)
  ).toDF("image_id", "role", "cluster_id")

  private def dispMap(df: org.apache.spark.sql.DataFrame): Map[String, (String, String)] =
    df.collect().map(r => r.getString(0) ->
      (r.getString(3), Option(r.getString(4)).getOrElse(""))).toMap

  test("default mode: first scan moves to first ref; others are scan_dups") {
    val got = dispMap(Resolver.resolve(members, ResolveConfig(copyToAll = false)))
    assert(got("r11") == ("keep", "") && got("r12") == ("keep", ""))
    assert(got("r31") == ("keep", ""))
    assert(got("s11") == ("move", "r11"), "scan rank-1 moves to ref rank-1")
    assert(got("s12") == ("scan_dup", ""))
    assert(got("s21") == ("none", "") && got("s22") == ("none", ""), "no ref ⇒ untouched")
    assert(got("s41") == ("move", "r41"))
    assert(got.size == members.count())
  }

  test("copy_to_all: max(0,|ref|-|scan|) copies then positional zip moves") {
    val got = Resolver.resolve(members, ResolveConfig(copyToAll = true))
    val m = got.collect().map(r => (r.getString(0), r.getString(3),
      Option(r.getString(4)).getOrElse(""))).toSet
    // cluster 4: n_ref=3, n_scan=1 ⇒ 2 copies (s41→r41, s41→r42) + zip move s41→r43
    assert(m.contains(("s41", "copy", "r41")))
    assert(m.contains(("s41", "copy", "r42")))
    assert(m.contains(("s41", "move", "r43")))
    // cluster 1: n_ref=2, n_scan=2 ⇒ 0 copies; zip: s11→r11, s12→r12
    assert(m.contains(("s11", "move", "r11")))
    assert(m.contains(("s12", "move", "r12")))
    // ref rows untouched in every mode
    assert(got.where(col("role") === "ref" && col("disposition") =!= "keep").count() == 0)
  }

  test("ref side is never a mutation target of itself (write-path guard X6)") {
    val got = Resolver.resolve(members, ResolveConfig(copyToAll = true))
    // every move/copy source is a scan row
    assert(got.where(col("disposition").isin("move", "copy") && col("role") =!= "scan")
      .count() == 0)
  }
}

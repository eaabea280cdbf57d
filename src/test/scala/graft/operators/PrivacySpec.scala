package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpecBase {

  import spark.implicits._

  // (nation, segment) quasi-identifier; bal is the sensitive value.
  // Class (1, "A"): 3 records, 2 distinct bals; (1, "B"): 1 record;
  // (2, "A"): 2 records with a null sensitive value among them.
  private lazy val people = Seq(
    (1, "A", Some(10)), (1, "A", Some(10)), (1, "A", Some(20)),
    (1, "B", Some(30)),
    (2, "A", Some(40)), (2, "A", None)
  ).toDF("nation", "segment", "bal")

  test("kAnonymity reports class size, l-diversity and the k flag") {
    val out = Privacy.kAnonymity(people, Seq("nation", "segment"), "bal", k = 2L)
      .orderBy("nation", "segment")
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getAs[Long]("class_size"), r.getAs[Long]("l_diversity"),
          r.getAs[Boolean]("anonymous"))).toMap
    assert(out((1, "A")) == ((3L, 2L, true)))
    assert(out((1, "B")) == ((1L, 1L, false)))
    // the null sensitive value doesn't count toward diversity
    assert(out((2, "A")) == ((2L, 1L, true)))
  }

  test("summary reports the dataset's actual k and below-k exposure") {
    val row = Privacy.kAnonymitySummary(
      people, Seq("nation", "segment"), "bal", k = 2L).head()
    assert(row.getAs[Long]("k_anonymity") == 1L)
    assert(row.getAs[Long]("l_diversity_min") == 1L)
    assert(row.getAs[Long]("n_classes") == 3L)
    assert(row.getAs[Long]("n_below_k") == 1L)
    assert(row.getAs[Long]("records_below_k") == 1L)
  }

  test("summary with no below-k classes reports zero exposure") {
    val row = Privacy.kAnonymitySummary(
      people.filter(col("segment") === "A"),
      Seq("nation", "segment"), "bal", k = 2L).head()
    assert(row.getAs[Long]("k_anonymity") == 2L)
    assert(row.getAs[Long]("n_below_k") == 0L)
    assert(row.getAs[Long]("records_below_k") == 0L)
  }
}

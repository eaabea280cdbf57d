package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs — one JVM-wide session (getOrCreate)
  * so suites don't pay repeated context startup.
  */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  // the shared tuned-session shape (GraftSession) so tests exercise the
  // same session config the bench and verify mains run under
  lazy val spark: SparkSession = GraftSession.builder("local[4]", "4")
    .getOrCreate()

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  override def afterAll(): Unit = {
    // keep the session for the next suite (getOrCreate reuses it)
    super.afterAll()
  }
}

package graft.io

import org.scalatest.funsuite.AnyFunSuite

class JdbcSourceSpec extends AnyFunSuite {
  test("incremental query embeds the watermark predicate (DB-side filtering)") {
    assert(
      JdbcSource.incrementalQuery("order_items", "CREATION_TIME_UTC", "2024-01-01 00:00:00")
        == "SELECT * FROM order_items WHERE CREATION_TIME_UTC >= '2024-01-01 00:00:00'")
  }
}

package graft.gold

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MoneySpec extends SparkSpec {
  import spark.implicits._

  test("decimal sum matches the integer-cents sum within the double range") {
    val df = Seq(12.3456, 0.0001, 99999.9999, -45.67, 0.005).toDF("x")
    val cents = df.agg(Money.sumMoney($"x")).as[Double].head()
    val dec = df.agg(Money.sumMoneyDecimal($"x")).as[Double].head()
    assert(cents == dec)
  }

  test("decimal sum stays exact where accumulated double cents would round") {
    // 2^53 cents ≈ 9.007e15; values near there lose integer exactness in
    // double arithmetic but not in decimal
    val big = Seq.fill(10)(900000000000.0001).toDF("x")
    val dec = big.agg(sum($"x".cast("decimal(38,4)"))).head().getDecimal(0)
    assert(dec.toPlainString == "9000000000000.0010")
  }
}

package graft
import org.apache.spark.sql.functions._
object DiagParity {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.select($"doc_id", conv(substring(md5($"text"), 1, 15), 16, 10).cast("long").as("h"))
      .orderBy("doc_id").limit(5).collect().foreach(println)
    println(docs.agg(sum(size(split(trim($"text"), "\\s+")))).collect()(0))
    val e = spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" < 4)
    val a = e.select($"vec_id".as("ida"), $"embedding".as("ea"))
    val b = e.select($"vec_id".as("idb"), $"embedding".as("eb"))
    a.join(b, $"ida" < $"idb")
      .select($"ida", $"idb",
        aggregate(zip_with($"ea", $"eb", (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("dot"),
        sqrt(aggregate(transform($"ea", x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, v) => acc + v)).as("na"))
      .orderBy("ida", "idb").collect().foreach(println)
  }
}

object DiagJw {
  def main(a: Array[String]): Unit = {
    val s1 = "customer window order filter scan vector small a filter row "
    val s2 = "customer small filter hash key key order merge line scan a a"
    println("jaro=" + graft.text.JaroWinkler.jaro(s1, s2))
    println("jw=" + graft.text.JaroWinkler.jaroWinkler(s1, s2))
  }
}

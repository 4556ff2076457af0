package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** Pins that the s17 bloom-filter write option does what the scale story
  * claims: the filter BYTES land in the parquet footer for the opted-in
  * column (and only that column), and the filter answers membership —
  * present keys always hit, absent keys mostly miss (the row-group-skip
  * decision a reader makes from the footer alone).
  */
class ParquetBloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom filter is written for the opted-in column and answers membership") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    (1L to 5000L).map(i => (i, i * 37 % 1000, s"v$i")).toDF("id", "key", "v")
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#key", "true")
      .option("parquet.bloom.filter.expected.ndv#key", "1000")
      // parquet-mr only materializes a bloom filter when the chunk is NOT
      // fully dictionary-encoded (a complete dictionary already answers
      // membership exactly) — disable dictionary on the column to model
      // the high-cardinality case the filter exists for
      .option("parquet.enable.dictionary#key", "false")
      .parquet(dir)
    val file = new java.io.File(dir).listFiles
      .find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(file.toString), spark.sparkContext.hadoopConfiguration))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val cols = block.getColumns.asScala
      def chunk(name: String) =
        cols.find(_.getPath.toDotString == name).get
      val bloomReader = reader.getBloomFilterDataReader(block)
      val keyBloom = bloomReader.readBloomFilter(chunk("key"))
      assert(keyBloom != null, "no bloom filter written for the opted-in column")
      assert(bloomReader.readBloomFilter(chunk("id")) == null,
        "bloom filter written for a column that never opted in")
      // every present key must hit (bloom filters have no false negatives)
      assert((0L until 1000L).forall(k =>
        keyBloom.findHash(keyBloom.hash(k))),
        "present key missed — false negatives break skipping correctness")
      // absent keys mostly miss — this is the skip decision; ndv=1000 at
      // default fpp makes ~0 of 1000 probes collide, allow a lax 5%
      val falseHits = (100000L until 101000L)
        .count(k => keyBloom.findHash(keyBloom.hash(k)))
      assert(falseHits < 50, s"bloom filter useless: $falseHits/1000 false hits")
    } finally reader.close()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.VectorFormats

class VectorFormatsSpec extends SparkSpec {

  test("generate: deterministic across partitionings, uniform(-1,1)") {
    val a = VectorFormats.generate(spark, 1000, 16, 42L)
      .orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq
    val b = VectorFormats.generate(spark, 1000, 16, 42L)
      .repartition(7).orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq
    assert(a == b)
    val flat = a.flatten
    assert(flat.forall(v => v >= -1f && v <= 1f))
    val mean = flat.map(_.toDouble).sum / flat.size
    assert(math.abs(mean) < 0.02, s"mean=$mean")
  }

  test("fvecs roundtrip: write -> distributed read") {
    val path = Files.createTempDirectory("graft_fvecs").resolve("x.fvecs").toString
    val vecs = (0 until 257).map(i => Array.tabulate(24)(j => i * 0.5f + j))
    VectorFormats.writeFvecs(vecs.iterator, path)
    val back = VectorFormats.readFvecs(spark, path, parallelism = 5)
      .orderBy("vec_id").collect()
    assert(back.length == 257)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i)
      assert(r.getSeq[Float](1).toArray.toSeq == vecs(i).toSeq)
    }
  }

  test("ivecs roundtrip") {
    val path = Files.createTempDirectory("graft_ivecs").resolve("gt.ivecs").toString
    val rows = (0 until 100).map(i => Array.tabulate(10)(j => i * 100 + j))
    VectorFormats.writeIvecs(rows.iterator, path)
    val back = VectorFormats.readIvecs(spark, path, parallelism = 3)
      .orderBy("query_id").collect()
    assert(back.length == 100)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Int](1).toArray.toSeq == rows(i).toSeq)
    }
  }

  test("fvecs read rejects corrupt files") {
    val path = Files.createTempDirectory("graft_bad").resolve("bad.fvecs").toString
    Files.write(java.nio.file.Paths.get(path), Array[Byte](1, 0, 0, 0, 9, 9))
    intercept[IllegalArgumentException](VectorFormats.readFvecs(spark, path))
  }

  test("npy roundtrip + numpy-written file compatibility") {
    val dir = Files.createTempDirectory("graft_npy")
    val p1 = dir.resolve("ours.npy").toString
    val vecs = (0 until 123).map(i => Array.tabulate(7)(j => i + j * 0.25f))
    VectorFormats.writeNpy(vecs.iterator, 123, 7, p1)
    val back = VectorFormats.readNpy(spark, p1, parallelism = 4)
      .orderBy("vec_id").collect()
    assert(back.length == 123)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Float](1).toArray.toSeq == vecs(i).toSeq)
    }
  }

  test("generated vectors feed the index build end to end") {
    val df = VectorFormats.generate(spark, 300, 8, 7L)
    val dir = Files.createTempDirectory("graft_gen_idx").toString
    val idx = graft.operators.Ivf.build(df, "vec_id", "embedding", dir)
    val q = df.where(col("vec_id") === 5).select("embedding")
      .head().getSeq[Float](0).toArray
    val top = graft.operators.Ivf.search(spark, idx, q, 3, 10000).collect()
    assert(top.head.getLong(0) == 5L && top.head.getDouble(1) == 0.0)
  }
}

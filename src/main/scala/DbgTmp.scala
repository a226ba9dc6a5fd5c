import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler._
import graft.corpus.Gen
import graft.spark.Pipeline
object Dbg {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("DBG_CPUS","16").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.storage.memoryMapThreshold", "512m")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    case class St(wall: Long, run: Long, cpu: Long, gc: Long, n: Int)
    val stats = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        stats.put(si.stageId, St(si.completionTime.getOrElse(0L)-si.submissionTime.getOrElse(0L),
          m.executorRunTime, m.executorCpuTime/1000000, m.jvmGCTime, si.numTasks))
      }
    })
    val dir = "/root/repo/data/corpus/scaling-sf0.1"
    val docs = Gen.readDocs(s, dir); val media = Gen.readMedia(s, dir)
    for (pass <- 1 to 3) {
      stats.clear()
      val t0 = System.nanoTime()
      Pipeline.extract(s, docs, media).toDF().agg(count(lit(1)), sum(col("bytes_in"))).collect()
      println(f"PASS $pass @ $cpus: ${(System.nanoTime()-t0)/1e9}%.2f s")
      import scala.jdk.CollectionConverters._
      stats.asScala.toSeq.sortBy(_._1).foreach { case (id,t) =>
        println(f"  STAGE $id%3d wall=${t.wall/1000.0}%6.2f run=${t.run/1000.0}%7.1f cpu=${t.cpu/1000.0}%7.1f gc=${t.gc/1000.0}%5.1f tasks=${t.n}%4d") }
    }
    s.stop()
  }
}

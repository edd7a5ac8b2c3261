package graft.operators
object MediaProf6 {
  def main(args: Array[String]): Unit = {
    val wav = (0L until 2000L).map(Multimodal.synthWav).toArray
    (0L until 300L).foreach(id => Multimodal.decodeAudio(wav((id % 2000).toInt)))
    val ts = (0 until 32).map { t =>
      val th = new Thread(() => (0 until 200000).foreach(i =>
        Multimodal.decodeAudio(wav(((t * 1000 + i) % 2000)))))
      th.start(); th
    }
    ts.foreach(_.join())
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ops.Multimodal.{attachBinary, MediaRow}

/** REAL perceptual-audio codec: MPEG-1 Audio (ISO/IEC 11172-3) Layers I
  * and II, pure JVM — the subband transform-coding family (MUSICAM) behind
  * MP2 broadcast audio and the direct ancestor of MP3. This closes the
  * last labeled [[Multimodal.FakeCodec]] boundary ("perceptual audio"):
  * the codec is genuinely lossy-by-design — a 32-band polyphase
  * filterbank, per-subband scalefactors, DYNAMIC bit allocation under the
  * frame bit budget (the perceptual rate-control loop), midtread
  * requantization, and the full ISO frame syntax.
  *
  * ISO-exact here: frame header fields and frame-length arithmetic,
  * CRC-16 (poly 0x8005) over the spec's protected bits, allocation table
  * 3-B.2a's (nbal, quantizer-set) structure, the scalefactor table
  * 2·2^(-idx/3), scfsi sharing semantics, Layer II 3/5/9-level sample
  * GROUPING (base-steps packing of 3 codes in 5/7/10 bits), the
  * requantization constants C = 2^nb/steps with D = 2^(1-nb) (grouped:
  * D = 1/2), and the Annex flowcharts — analysis 3-C.3 (512-sample
  * window, sign-folded 8-way sum, 32x64 cosine matrix) and synthesis
  * 3-A.2 (64x32 matrix, 1024-entry V FIFO, U extraction, windowed
  * 16-way sum).
  *
  * Honest boundary (same class as the arithmetic-JPEG bit-parity note on
  * q268): the 512-tap prototype lowpass of ISO Tables 3-B.3/3-C.1 is pure
  * TABLE data with no closed form; transcribing 512 ten-digit constants
  * from memory offline would be hallucination-prone. The window below is
  * instead DERIVED from the public pseudo-QMF design constraints — a
  * Kaiser-windowed sinc at the 32-band cutoff, symmetric about tap 256
  * (which is what makes the flowchart modulation phases land on the
  * classic ±(2k+1)π/4 alias-cancellation pair), refined by composite-
  * power-response flattening to 80 dB round-trip SNR and normalized for
  * unit cascade gain (generator: tools/mp2_window_design.py, committed).
  * Bitstreams are ISO-SYNTACTIC but a reference decoder would reconstruct
  * through a slightly different (still near-PR) filterbank; MpegAudioSpec
  * pins reconstruction SNR, band selectivity, grouping round-trips, CRC
  * rejection, and every-byte corruption fail-soft instead of cross-
  * implementation bit parity, and the scaladoc says so rather than
  * implying conformance that cannot be verified offline.
  *
  * Reference scope note: `/root/reference` (sharding_recreation.py) has
  * no media path at all; this family exists for the §2.3 multimodal
  * north star (decode as a distributed, partition-parallel operator).
  */
object MpegAudioCodec {

  // ---------------------------------------------------------------------
  // Derived prototype window + polyphase filterbanks
  // ---------------------------------------------------------------------

  /** 512-tap derived prototype (see object scaladoc): symmetric about
    * n = 256, unit cascade gain, 80 dB analysis→synthesis SNR. Frozen
    * output of tools/mp2_window_design.py.
    */
  val Prototype: Array[Double] = Array(
    -1.2296035245228476e-05, -1.2119072185232987e-05, -1.19062861317259e-05,
    -1.165749250761185e-05, -1.1372723844588168e-05, -1.105225122614869e-05,
    -1.0696605903587464e-05, -1.030660089348837e-05, -9.883352347504856e-06,
    -9.428300468400591e-06, -8.943229730565553e-06, -8.430288148235721e-06,
    -7.892005321066716e-06, -7.331308974362516e-06, -6.751539700747247e-06,
    -6.156463601094435e-06, -5.550282515946725e-06, -4.937641533965683e-06,
    -4.323633461911049e-06, -3.713799941085776e-06, -3.1141288984819973e-06,
    -2.531048026965682e-06, -1.971413998212303e-06, -1.442497124420763e-06,
    -9.519612007155656e-07, -5.078382791836286e-07, -1.1849814819884881e-07,
    2.0738768333328112e-07, 4.608876674864515e-07, 6.328577022937455e-07,
    7.139945212711927e-07, 6.948950487730956e-07, 5.661217393275964e-07,
    3.18273872738549e-07, -5.793527232022046e-08, -5.71595495557957e-07,
    -1.2315111869603476e-06, -2.046107513727882e-06,
    -3.0233315814724432e-06, -4.1705489289645475e-06, -5.49443577733283e-06,
    -7.000867516891048e-06, -8.694803977573181e-06, -1.0580172091620809e-05,
    -1.2659746619527249e-05, -1.4935029671331656e-05,
    -1.7406129815262736e-05, -2.0071641623313485e-05,
    -2.292852655854417e-05, -2.5971996160845845e-05, -2.919539853627588e-05,
    -3.259010919906544e-05, -3.614542735471177e-05, -3.9848478746395746e-05,
    -4.3684126214975006e-05, -4.763488914433207e-05,
    -5.1680872978423795e-05, -5.5799710003530834e-05,
    -5.9966512588496335e-05, -6.415384006659964e-05, -6.833168042501759e-05,
    -7.24674479409077e-05, -7.65259978670132e-05, -8.046965922385047e-05,
    -8.425835093949787e-05, -8.784949555167132e-05, -9.119814136588524e-05,
    -9.425730044161842e-05, -9.69778624136329e-05, -9.930881854064529e-05,
    -0.00010119744490467045, -0.00010258950933473971,
    -0.00010342950225569522, -0.00010366089152064422,
    -0.00010322640113549112, -0.00010206831362619072,
    -0.00010012879563486698, -9.735024616013632e-05, -9.367566668101001e-05,
    -8.904905222323047e-05, -8.341580224286848e-05, -7.672315001555547e-05,
    -6.892060903176755e-05, -5.996043471033083e-05, -4.9798099554996916e-05,
    -3.8392779693597115e-05, -2.5707850557412648e-05,
    -1.1711389281102731e-05, 3.6233187677987187e-06, 2.0317272084818714e-05,
    3.83852466602832e-05, 5.783529420264784e-05, 7.866824814323873e-05,
    0.00010087724073366358, 0.00012444723465459897, 0.00014935457264688524,
    0.00017556654875172886, 0.0002030410048049508, 0.00023172595586974732,
    0.00026155924831218664, 0.00029246825422269063, 0.00032436960586427327,
    0.0003571689737834193, 0.00039076089215167863, 0.00042502863481467797,
    0.00045984414540990455, 0.0004950680247750021, 0.0005305495787043468,
    0.0005661269289231343, 0.000601627189935466, 0.0006368667141660911,
    0.0006716514075549396, 0.0007057771174801565, 0.0007390300945794606,
    0.0007711875297124682, 0.0008020181669590235, 0.0008312829931818447,
    0.0008587360042972906, 0.0008841250479971959, 0.0009071927422494258,
    0.000927677468476396, 0.0009453144378719236, 0.0009598368288686238,
    0.000970976993313682, 0.0009784677284518375, 0.00098204361135359,
    0.000981442391966375, 0.0009764064405090992, 0.0009666842404551214,
    0.0009520319337833864, 0.0009322149170205743, 0.0009070094234313031,
    0.00087620418186793, 0.0008396020717870137, 0.0007970217946935621,
    0.0007482995504843914, 0.0006932907108774295, 0.0006318714818349236,
    0.0005639405466420483, 0.0004894206810904475, 0.00040826033204091535,
    0.0003204351505030051, 0.0002259494702736396, 0.00012483772312347731,
    1.7165781510503104e-05, -9.696778016354955e-05, -0.00021743051465586256,
    -0.0003440550301160644, -0.0004766380260444277, -0.0006149394453417587,
    -0.0007586817505426067, -0.0009075493319993589, -0.0010611880554122627,
    -0.0012192049556802626, -0.001381168083580391, -0.0015466065112707589,
    -0.0017150105020548251, -0.001885831849245201, -0.002058484388324463,
    -0.0022323446859219775, -0.002406752908410652, -0.002581013872179701,
    -0.0027543982768611784, -0.002926144121982853, -0.0030954583066909276,
    -0.0032615184113373615, -0.003423474658861421, -0.0035804520530176944,
    -0.0037315526896174833, -0.003875858236061294, -0.004012432573551424,
    -0.004140324595489908, -0.004258571154693178, -0.004366200151194451,
    -0.004462233751563878, -0.0045456917298581515, -0.004615594919521244,
    -0.004670968764800187, -0.004710846959518494, -0.004734275160370101,
    -0.004740314761261982, -0.004728046714648082, -0.004696575385265278,
    -0.004645032421206651, -0.004572580626852004, -0.004478417821824483,
    -0.004361780669856321, -0.00422194846123058, -0.004058246832320993,
    -0.00387005140567971, -0.0036567913341265094, -0.0034179527323719423,
    -0.0031530818879902185, -0.0028617886565591123, -0.0025437493879739547,
    -0.002198709454030983, -0.0018264861904157095, -0.0014269712300550724,
    -0.0010001327093301143, -0.000546017242218393, -6.475165006927278e-05,
    0.00044345556445579996, 0.0009783130098522776, 0.0015394454742694336,
    0.0021263932786405636, 0.002738611921984284, 0.003375472025297681,
    0.004036259579300176, 0.0047201765000847145, 0.005426341495496127,
    0.006153791243790129, 0.00690148188483621, 0.0076682908228198786,
    0.008453018838079238, 0.009254392504385289, 0.010071066906649604,
    0.010901628652723656, 0.011744599171648414, 0.012598438289425052,
    0.013461548072116645, 0.014332276924859742, 0.015208923934173214,
    0.016089743439802046, 0.01697294982123532, 0.017856722482992044,
    0.018739211021786144, 0.019618540557762056, 0.020492817211144942,
    0.021360133704877285, 0.022218575073117853, 0.023066224454869694,
    0.023901168951478827, 0.024721505526309216, 0.025525346924558562,
    0.026310827590928662, 0.027076109562713856, 0.02781938831581425,
    0.02853889854122438, 0.029232919829689535, 0.029899782242462626,
    0.0305378717464317, 0.031145635492324124, 0.031721586915222595,
    0.03226431063725249, 0.03277246715301259, 0.033244797279124924,
    0.033680126350163056, 0.03407736814418717, 0.03443552852215557,
    0.03475370876659761, 0.0350311086061143, 0.035267028913515644,
    0.035460874066703035, 0.03561215396275359, 0.035720485677054735,
    0.035785594760770645, 0.03580731617137886, 0.035785594760770645,
    0.035720485677054735, 0.03561215396275359, 0.035460874066703035,
    0.035267028913515644, 0.0350311086061143, 0.03475370876659761,
    0.03443552852215557, 0.03407736814418717, 0.033680126350163056,
    0.033244797279124924, 0.03277246715301259, 0.03226431063725249,
    0.031721586915222595, 0.031145635492324124, 0.0305378717464317,
    0.029899782242462626, 0.029232919829689535, 0.02853889854122438,
    0.02781938831581425, 0.027076109562713856, 0.026310827590928662,
    0.025525346924558562, 0.024721505526309216, 0.023901168951478827,
    0.023066224454869694, 0.022218575073117853, 0.021360133704877285,
    0.020492817211144942, 0.019618540557762056, 0.018739211021786144,
    0.017856722482992044, 0.01697294982123532, 0.016089743439802046,
    0.015208923934173214, 0.014332276924859742, 0.013461548072116645,
    0.012598438289425052, 0.011744599171648414, 0.010901628652723656,
    0.010071066906649604, 0.009254392504385289, 0.008453018838079238,
    0.0076682908228198786, 0.00690148188483621, 0.006153791243790129,
    0.005426341495496127, 0.0047201765000847145, 0.004036259579300176,
    0.003375472025297681, 0.002738611921984284, 0.0021263932786405636,
    0.0015394454742694336, 0.0009783130098522776, 0.00044345556445579996,
    -6.475165006927278e-05, -0.000546017242218393, -0.0010001327093301143,
    -0.0014269712300550724, -0.0018264861904157095, -0.002198709454030983,
    -0.0025437493879739547, -0.0028617886565591123, -0.0031530818879902185,
    -0.0034179527323719423, -0.0036567913341265094, -0.00387005140567971,
    -0.004058246832320993, -0.00422194846123058, -0.004361780669856321,
    -0.004478417821824483, -0.004572580626852004, -0.004645032421206651,
    -0.004696575385265278, -0.004728046714648082, -0.004740314761261982,
    -0.004734275160370101, -0.004710846959518494, -0.004670968764800187,
    -0.004615594919521244, -0.0045456917298581515, -0.004462233751563878,
    -0.004366200151194451, -0.004258571154693178, -0.004140324595489908,
    -0.004012432573551424, -0.003875858236061294, -0.0037315526896174833,
    -0.0035804520530176944, -0.003423474658861421, -0.0032615184113373615,
    -0.0030954583066909276, -0.002926144121982853, -0.0027543982768611784,
    -0.002581013872179701, -0.002406752908410652, -0.0022323446859219775,
    -0.002058484388324463, -0.001885831849245201, -0.0017150105020548251,
    -0.0015466065112707589, -0.001381168083580391, -0.0012192049556802626,
    -0.0010611880554122627, -0.0009075493319993589, -0.0007586817505426067,
    -0.0006149394453417587, -0.0004766380260444277, -0.0003440550301160644,
    -0.00021743051465586256, -9.696778016354955e-05, 1.7165781510503104e-05,
    0.00012483772312347731, 0.0002259494702736396, 0.0003204351505030051,
    0.00040826033204091535, 0.0004894206810904475, 0.0005639405466420483,
    0.0006318714818349236, 0.0006932907108774295, 0.0007482995504843914,
    0.0007970217946935621, 0.0008396020717870137, 0.00087620418186793,
    0.0009070094234313031, 0.0009322149170205743, 0.0009520319337833864,
    0.0009666842404551214, 0.0009764064405090992, 0.000981442391966375,
    0.00098204361135359, 0.0009784677284518375, 0.000970976993313682,
    0.0009598368288686238, 0.0009453144378719236, 0.000927677468476396,
    0.0009071927422494258, 0.0008841250479971959, 0.0008587360042972906,
    0.0008312829931818447, 0.0008020181669590235, 0.0007711875297124682,
    0.0007390300945794606, 0.0007057771174801565, 0.0006716514075549396,
    0.0006368667141660911, 0.000601627189935466, 0.0005661269289231343,
    0.0005305495787043468, 0.0004950680247750021, 0.00045984414540990455,
    0.00042502863481467797, 0.00039076089215167863, 0.0003571689737834193,
    0.00032436960586427327, 0.00029246825422269063, 0.00026155924831218664,
    0.00023172595586974732, 0.0002030410048049508, 0.00017556654875172886,
    0.00014935457264688524, 0.00012444723465459897, 0.00010087724073366358,
    7.866824814323873e-05, 5.783529420264784e-05, 3.83852466602832e-05,
    2.0317272084818714e-05, 3.6233187677987187e-06, -1.1711389281102731e-05,
    -2.5707850557412648e-05, -3.8392779693597115e-05,
    -4.9798099554996916e-05, -5.996043471033083e-05, -6.892060903176755e-05,
    -7.672315001555547e-05, -8.341580224286848e-05, -8.904905222323047e-05,
    -9.367566668101001e-05, -9.735024616013632e-05, -0.00010012879563486698,
    -0.00010206831362619072, -0.00010322640113549112,
    -0.00010366089152064422, -0.00010342950225569522,
    -0.00010258950933473971, -0.00010119744490467045,
    -9.930881854064529e-05, -9.69778624136329e-05, -9.425730044161842e-05,
    -9.119814136588524e-05, -8.784949555167132e-05, -8.425835093949787e-05,
    -8.046965922385047e-05, -7.65259978670132e-05, -7.24674479409077e-05,
    -6.833168042501759e-05, -6.415384006659964e-05, -5.9966512588496335e-05,
    -5.5799710003530834e-05, -5.1680872978423795e-05,
    -4.763488914433207e-05, -4.3684126214975006e-05,
    -3.9848478746395746e-05, -3.614542735471177e-05, -3.259010919906544e-05,
    -2.919539853627588e-05, -2.5971996160845845e-05, -2.292852655854417e-05,
    -2.0071641623313485e-05, -1.7406129815262736e-05,
    -1.4935029671331656e-05, -1.2659746619527249e-05,
    -1.0580172091620809e-05, -8.694803977573181e-06, -7.000867516891048e-06,
    -5.49443577733283e-06, -4.1705489289645475e-06, -3.0233315814724432e-06,
    -2.046107513727882e-06, -1.2315111869603476e-06, -5.71595495557957e-07,
    -5.793527232022046e-08, 3.18273872738549e-07, 5.661217393275964e-07,
    6.948950487730956e-07, 7.139945212711927e-07, 6.328577022937455e-07,
    4.608876674864515e-07, 2.0738768333328112e-07, -1.1849814819884881e-07,
    -5.078382791836286e-07, -9.519612007155656e-07, -1.442497124420763e-06,
    -1.971413998212303e-06, -2.531048026965682e-06, -3.1141288984819973e-06,
    -3.713799941085776e-06, -4.323633461911049e-06, -4.937641533965683e-06,
    -5.550282515946725e-06, -6.156463601094435e-06, -6.751539700747247e-06,
    -7.331308974362516e-06, -7.892005321066716e-06, -8.430288148235721e-06,
    -8.943229730565553e-06, -9.428300468400591e-06, -9.883352347504856e-06,
    -1.030660089348837e-05, -1.0696605903587464e-05, -1.105225122614869e-05,
    -1.1372723844588168e-05, -1.165749250761185e-05, -1.19062861317259e-05,
    -1.2119072185232987e-05
  )

  /** Analysis window C[n] = (-1)^(n/64)·h[n] — the sign fold that makes
    * the flowchart's plain 8-way sum equal direct cosine modulation:
    * cos((2k+1)(n-16)π/64) flips sign every 64 taps for odd 2k+1.
    */
  val AnalysisC: Array[Double] =
    Array.tabulate(512)(n => (if (((n >> 6) & 1) == 0) 1.0 else -1.0) * Prototype(n))

  /** Synthesis window D[n] = 32·(-1)^(n/64)·h[n]: writing the matched
    * synthesis filter g_k[n] = h[n]·cos((2k+1)(n+16)π/64) in the
    * flowchart's D[64j+i]·V[i] form pulls out the same (-1)^j per
    * 64-block; 32x is the spec's D-table scale.
    */
  val SynthesisD: Array[Double] =
    Array.tabulate(512)(n =>
      32.0 * (if (((n >> 6) & 1) == 0) 1.0 else -1.0) * Prototype(n))

  /** End-to-end codec latency in samples (analysis + synthesis polyphase
    * delay), the classic MPEG-1 figure — spec-pinned numerically.
    */
  val CodecDelay = 481

  // StrictMath in all table construction: Math.cos is only 1-ulp-accurate
  // and may differ across JVMs/platforms; fdlibm semantics keep decoded
  // PCM bit-identical on every executor.
  private val MAna: Array[Array[Double]] =
    Array.tabulate(32, 64)((k, i) =>
      StrictMath.cos((2 * k + 1) * (i - 16) * math.Pi / 64.0))

  private val NSyn: Array[Array[Double]] =
    Array.tabulate(64, 32)((i, k) =>
      StrictMath.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0))

  /** Streaming analysis filterbank (flowchart 3-C.3): feed 32 PCM samples
    * (newest at X[0]), window by C, fold to 64, matrix to 32 subbands.
    */
  final class Analysis {
    private val x = new Array[Double](512)
    def feed(in: Array[Double], off: Int): Array[Double] = {
      System.arraycopy(x, 0, x, 32, 480)
      var i = 0
      while (i < 32) { x(i) = in(off + 31 - i); i += 1 }
      val y = new Array[Double](64)
      i = 0
      while (i < 64) {
        var s = 0.0
        var j = 0
        while (j < 8) { s += AnalysisC(i + (j << 6)) * x(i + (j << 6)); j += 1 }
        y(i) = s
        i += 1
      }
      val out = new Array[Double](32)
      var k = 0
      while (k < 32) {
        val m = MAna(k)
        var s = 0.0
        i = 0
        while (i < 64) { s += m(i) * y(i); i += 1 }
        out(k) = s
        k += 1
      }
      out
    }
  }

  /** Streaming synthesis filterbank (flowchart 3-A.2): feed 32 subband
    * samples, matrix to 64, shift the 1024 V FIFO, U extraction, window
    * by D, 16-way sum → 32 PCM samples.
    */
  final class Synthesis {
    private val v = new Array[Double](1024)
    def feed(sb: Array[Double]): Array[Double] = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        val n = NSyn(i)
        var s = 0.0
        var k = 0
        while (k < 32) { s += n(k) * sb(k); k += 1 }
        v(i) = s
        i += 1
      }
      val out = new Array[Double](32)
      var j = 0
      while (j < 16) {
        val vOff = (j >> 1) * 128 + (if ((j & 1) == 0) 0 else 96)
        val dOff = j << 5
        i = 0
        while (i < 32) {
          out(i) += SynthesisD(dOff + i) * v(vOff + i)
          i += 1
        }
        j += 1
      }
      out
    }
  }

  // ---------------------------------------------------------------------
  // Bit I/O + CRC-16
  // ---------------------------------------------------------------------

  /** MSB-first bit writer over a fixed-size frame buffer. */
  private final class BitWriter(val buf: Array[Byte]) {
    var pos = 0 // bit position
    def put(v: Int, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        if (((v >> b) & 1) != 0) buf(pos >> 3) = (buf(pos >> 3) | (0x80 >> (pos & 7))).toByte
        pos += 1
        b -= 1
      }
    }
  }

  /** MSB-first bit reader; `ok` goes false on overrun instead of throwing
    * (hostile frames truncate mid-field).
    */
  private final class BitReader(val buf: Array[Byte], val limitBits: Int) {
    var pos = 0
    var ok = true
    def get(bits: Int): Int = {
      if (pos + bits > limitBits) { ok = false; return 0 }
      var v = 0
      var b = bits
      while (b > 0) {
        v = (v << 1) | ((buf(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1
        b -= 1
      }
      v
    }
  }

  /** ISO 11172-3 CRC-16: poly x^16+x^15+x^2+1 (0x8005), init 0xFFFF,
    * fed MSB-first over the protected bit range.
    */
  private[ops] def crc16(bits: Array[Byte], fromBit: Int, nBits: Int, init: Int = 0xffff): Int = {
    var crc = init
    var i = 0
    while (i < nBits) {
      val p = fromBit + i
      val bit = (bits(p >> 3) >> (7 - (p & 7))) & 1
      val msb = (crc >> 15) & 1
      crc = ((crc << 1) & 0xffff)
      if ((msb ^ bit) != 0) crc ^= 0x8005
      i += 1
    }
    crc
  }

  // ---------------------------------------------------------------------
  // Quantization tables
  // ---------------------------------------------------------------------

  /** Scalefactor table: sf[idx] = 2·2^(-idx/3), idx 0..62 (63 reserved).
    * Exact powers of two at idx ≡ 0 (mod 3); StrictMath for the rest.
    */
  val ScaleFactors: Array[Double] =
    Array.tabulate(63)(i => 2.0 * StrictMath.pow(2.0, -i / 3.0))

  /** One Layer II quantizer class: level count, ungrouped code width nb,
    * grouped triplet width (0 = ungrouped), requant C and D.
    */
  final case class Quant(steps: Int, nb: Int, groupBits: Int, c: Double, d: Double) {
    /** bits for 36 subband samples (12 granules of 3) */
    def bitsPerBand: Int = if (groupBits > 0) 12 * groupBits else 36 * nb
    def snrDb: Double = 20.0 * StrictMath.log10(steps.toDouble)
  }

  private def q(steps: Int): Quant = {
    val nb = 32 - Integer.numberOfLeadingZeros(steps) // ceil(log2(steps+1))
    val grouped = steps == 3 || steps == 5 || steps == 9
    val gb = steps match { case 3 => 5; case 5 => 7; case 9 => 10; case _ => 0 }
    val c = (1L << nb).toDouble / steps
    val d = if (grouped) 0.5 else StrictMath.pow(2.0, 1 - nb)
    Quant(steps, nb, gb, c, d)
  }

  val QuantBySteps: Map[Int, Quant] =
    Seq(3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
      16383, 32767, 65535).map(s => s -> q(s)).toMap

  /** Layer I quantizers by alloc code 1..14: nb = code+1, steps = 2^nb−1. */
  val QuantL1: Array[Quant] =
    Array.tabulate(15)(c => if (c == 0) null else q((1 << (c + 1)) - 1))

  /** Allocation table 3-B.2a (48 kHz, ≥56 kbps/ch): 27 subbands, per-band
    * nbal and quantizer set. Alloc code 0 = silent; code c>0 selects
    * steps(c-1).
    */
  final case class BandAlloc(nbal: Int, steps: Array[Int])
  val TableB2a: Array[BandAlloc] = {
    val low = Array(3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
      8191, 16383, 32767, 65535) // sb 0-2, nbal 4
    val mid = Array(3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047,
      4095, 8191, 65535) // sb 3-10, nbal 4
    val high = Array(3, 5, 7, 9, 15, 31, 65535) // sb 11-22, nbal 3
    val top = Array(3, 5, 65535) // sb 23-26, nbal 2
    (0 until 27).map { sb =>
      if (sb < 3) BandAlloc(4, low)
      else if (sb < 11) BandAlloc(4, mid)
      else if (sb < 23) BandAlloc(3, high)
      else BandAlloc(2, top)
    }.toArray
  }
  val SbLimit = 27

  /** Layer II bitrate table (kbps), index 1..14. */
  val BitratesL2: Array[Int] =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)

  /** Layer I bitrate table (kbps), index 1..14. */
  val BitratesL1: Array[Int] =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)

  val SampleRate = 48000 // fs index 0b01

  /** midtread quantize of x ∈ [-1,1] to code 0..steps-1 (nearest level) */
  private[ops] def quantize(x: Double, qu: Quant): Int = {
    val v = StrictMath.floor((x / qu.c + 1.0 - qu.d) * (1 << (qu.nb - 1)) + 0.5).toInt
    math.max(0, math.min(qu.steps - 1, v))
  }

  /** spec requantization: s'' = C·(code/2^(nb-1) − 1 + D) */
  private[ops] def dequantize(code: Int, qu: Quant): Double =
    qu.c * (code.toDouble / (1 << (qu.nb - 1)) - 1.0 + qu.d)

  // ---------------------------------------------------------------------
  // Layer II encode
  // ---------------------------------------------------------------------

  /** PCM → Layer II stream at `bitrateIndex` (default 192 kbps — the
    * highest SINGLE-CHANNEL bitrate Layer II allows; 224–384 kbps are
    * stereo-only combinations per 11172-3 §2.4.2.3), 48 kHz mono, CRC
    * on. Input padded with zeros to a 1152 multiple. Indices 3..10
    * (56–192 kbps) — the Table 3-B.2a regime; the low-rate B.2c/B.2d
    * allocation tables are not implemented.
    */
  def encodeL2(pcm: Array[Short], bitrateIndex: Int = 10): Array[Byte] =
    encodeL2WithSum(pcm, bitrateIndex)._1

  /** [[encodeL2]] plus a position-weighted checksum over every side-info
    * field and sample code in write order (alloc, scfsi, scalefactor
    * indices, quantized codes) — the decoder recomputes it in read order,
    * so equality pins the whole bitstream layer encoder↔decoder
    * (q277's `stream_ok`), independent of filterbank fidelity.
    */
  def encodeL2WithSum(pcm: Array[Short], bitrateIndex: Int = 10): (Array[Byte], Long) = {
    require(bitrateIndex >= 3 && bitrateIndex <= 10,
      "Layer II mono: 56-192 kbps (table 3-B.2a regime)")
    val frameBytes = 144 * (BitratesL2(bitrateIndex) * 1000) / SampleRate
    val n = math.max(1, pcm.length)
    // + CodecDelay: flush frames so the decoder emits the whole delayed
    // signal (the filterbank holds 481 samples of look-back)
    val nFrames = (n + CodecDelay + 1151) / 1152
    val out = new Array[Byte](nFrames * frameBytes)
    val ana = new Analysis
    val in = new Array[Double](32)
    val sum = new CodeSum
    var f = 0
    while (f < nFrames) {
      // 36 filterbank feeds → sb(t)(k); feed() returns fresh rows
      val sb = new Array[Array[Double]](36)
      var t = 0
      while (t < 36) {
        var i = 0
        while (i < 32) {
          val idx = f * 1152 + t * 32 + i
          in(i) = if (idx < pcm.length) pcm(idx) / 32768.0 else 0.0
          i += 1
        }
        sb(t) = ana.feed(in, 0)
        t += 1
      }
      encodeL2Frame(sb, bitrateIndex, out, f * frameBytes, frameBytes, sum)
      f += 1
    }
    (out, sum.value)
  }

  /** rolling side-info/sample-code checksum (31x + v, like String.hashCode
    * but 64-bit) — order-sensitive, so field transpositions are caught
    */
  final class CodeSum { 
    var value = 0L
    def add(v: Int): Unit = { value = value * 31 + v }
  }

  /** Encode one Layer II frame: scalefactors, scfsi, greedy MNR bit
    * allocation under the frame budget, grouped/ungrouped packing, CRC.
    */
  private def encodeL2Frame(sb: Array[Array[Double]], bitrateIndex: Int,
      out: Array[Byte], off: Int, frameBytes: Int, sum: CodeSum): Unit = {
    // per-(band, part) peak and scalefactor index (tightest sf ≥ peak)
    val sfIdx = Array.ofDim[Int](SbLimit, 3)
    val peak = new Array[Double](SbLimit)
    var k = 0
    while (k < SbLimit) {
      var part = 0
      while (part < 3) {
        var mx = 0.0
        var t = part * 12
        while (t < part * 12 + 12) {
          val a = math.abs(sb(t)(k)); if (a > mx) mx = a
          t += 1
        }
        if (mx > peak(k)) peak(k) = mx
        // largest index whose sf still covers mx (sf decreasing in idx)
        var i = 62
        while (i > 0 && ScaleFactors(i) < mx) i -= 1
        sfIdx(k)(part) = i
        part += 1
      }
      k += 1
    }
    val scfsi = Array.tabulate(SbLimit) { k =>
      val Array(a, b, c) = sfIdx(k)
      if (a == b && b == c) 2 else if (a == b) 1 else if (b == c) 3 else 0
    }
    def nSf(s: Int): Int = s match { case 0 => 3; case 2 => 1; case _ => 2 }

    // greedy MNR allocation: give the loudest under-served band the next
    // quantizer while its bit cost fits the remaining budget
    val alloc = new Array[Int](SbLimit) // 0 = silent, else 1-based index
    val fixedBits = 32 + 16 + TableB2a.map(_.nbal).sum
    var used = fixedBits
    var progress = true
    while (progress) {
      progress = false
      var bestBand = -1
      var bestMnr = Double.NegativeInfinity
      var bestCost = 0
      var kk = 0
      while (kk < SbLimit) {
        val ba = TableB2a(kk)
        if (peak(kk) > 0 && alloc(kk) < ba.steps.length) {
          val cur = alloc(kk)
          val curBits = if (cur == 0) 0 else QuantBySteps(ba.steps(cur - 1)).bitsPerBand
          val nxt = QuantBySteps(ba.steps(cur))
          val sideBits = if (cur == 0) 2 + 6 * nSf(scfsi(kk)) else 0
          val cost = nxt.bitsPerBand - curBits + sideBits
          if (used + cost <= frameBytes * 8) {
            val sigDb = 20.0 * StrictMath.log10(peak(kk) + 1e-10)
            val curSnr = if (cur == 0) 0.0 else QuantBySteps(ba.steps(cur - 1)).snrDb
            val mnr = sigDb - curSnr
            if (mnr > bestMnr) { bestMnr = mnr; bestBand = kk; bestCost = cost }
          }
        }
        kk += 1
      }
      if (bestBand >= 0) {
        alloc(bestBand) += 1
        used += bestCost
        progress = true
      }
    }

    // pack
    val w = new BitWriter(out)
    w.pos = off * 8
    w.put(0xfff, 12) // sync
    w.put(1, 1) // ID: MPEG-1
    w.put(2, 2) // layer II = '10'
    w.put(0, 1) // protection_bit = 0 → CRC present
    w.put(bitrateIndex, 4)
    w.put(1, 2) // 48 kHz
    w.put(0, 1) // padding (frame length divides exactly at 48 kHz)
    w.put(0, 1) // private
    w.put(3, 2) // single channel
    w.put(0, 2) // mode extension
    w.put(0, 1) // copyright
    w.put(1, 1) // original
    w.put(0, 2) // emphasis
    val crcPos = w.pos
    w.put(0, 16) // CRC patched below
    val protFrom = w.pos
    var kk = 0
    while (kk < SbLimit) {
      w.put(alloc(kk), TableB2a(kk).nbal); sum.add(alloc(kk)); kk += 1
    }
    kk = 0
    while (kk < SbLimit) {
      if (alloc(kk) > 0) { w.put(scfsi(kk), 2); sum.add(scfsi(kk)) }
      kk += 1
    }
    val protTo = w.pos
    kk = 0
    while (kk < SbLimit) {
      if (alloc(kk) > 0) {
        val parts: Seq[Int] = scfsi(kk) match {
          case 0 => Seq(0, 1, 2)
          case 1 => Seq(0, 2)
          case 2 => Seq(0)
          case 3 => Seq(0, 1)
        }
        parts.foreach { pt => w.put(sfIdx(kk)(pt), 6); sum.add(sfIdx(kk)(pt)) }
      }
      kk += 1
    }
    var g = 0
    while (g < 12) {
      kk = 0
      while (kk < SbLimit) {
        if (alloc(kk) > 0) {
          val qu = QuantBySteps(TableB2a(kk).steps(alloc(kk) - 1))
          val sf = ScaleFactors(sfIdx(kk)(g / 4))
          val v0 = quantize(sb(3 * g)(kk) / sf, qu)
          val v1 = quantize(sb(3 * g + 1)(kk) / sf, qu)
          val v2 = quantize(sb(3 * g + 2)(kk) / sf, qu)
          if (qu.groupBits > 0)
            w.put(v0 + qu.steps * v1 + qu.steps * qu.steps * v2, qu.groupBits)
          else { w.put(v0, qu.nb); w.put(v1, qu.nb); w.put(v2, qu.nb) }
          sum.add(v0); sum.add(v1); sum.add(v2)
        }
        kk += 1
      }
      g += 1
    }
    require(w.pos <= (off + frameBytes) * 8, "Layer II frame overflow")
    // CRC over header bits 16..31 + bit allocation + scfsi (spec coverage)
    var crc = crc16(out, off * 8 + 16, 16)
    crc = crc16(out, protFrom, protTo - protFrom, crc)
    val wc = new BitWriter(out)
    wc.pos = crcPos
    wc.put(crc, 16)
  }

  // ---------------------------------------------------------------------
  // Layer I encode
  // ---------------------------------------------------------------------

  /** PCM → Layer I stream (384-sample frames, 4-bit allocation over all
    * 32 subbands, one scalefactor per active band), 48 kHz mono, CRC on.
    * Default 448 kbps (Layer I has no mode/bitrate restrictions).
    */
  def encodeL1(pcm: Array[Short], bitrateIndex: Int = 14): Array[Byte] =
    encodeL1WithSum(pcm, bitrateIndex)._1

  /** [[encodeL1]] plus the side-info/code checksum (see encodeL2WithSum). */
  def encodeL1WithSum(pcm: Array[Short], bitrateIndex: Int = 14): (Array[Byte], Long) = {
    require(bitrateIndex >= 1 && bitrateIndex <= 14, "bad bitrate index")
    val frameBytes = 12 * (BitratesL1(bitrateIndex) * 1000) / SampleRate * 4
    val n = math.max(1, pcm.length)
    val nFrames = (n + CodecDelay + 383) / 384 // + flush (see encodeL2)
    val out = new Array[Byte](nFrames * frameBytes)
    val ana = new Analysis
    val in = new Array[Double](32)
    val sum = new CodeSum
    var f = 0
    while (f < nFrames) {
      val sb = new Array[Array[Double]](12) // feed() returns fresh rows
      var t = 0
      while (t < 12) {
        var i = 0
        while (i < 32) {
          val idx = f * 384 + t * 32 + i
          in(i) = if (idx < pcm.length) pcm(idx) / 32768.0 else 0.0
          i += 1
        }
        sb(t) = ana.feed(in, 0)
        t += 1
      }
      encodeL1Frame(sb, bitrateIndex, out, f * frameBytes, frameBytes, sum)
      f += 1
    }
    (out, sum.value)
  }

  private def encodeL1Frame(sb: Array[Array[Double]], bitrateIndex: Int,
      out: Array[Byte], off: Int, frameBytes: Int, sum: CodeSum): Unit = {
    val sfIdx = new Array[Int](32)
    val peak = new Array[Double](32)
    var k = 0
    while (k < 32) {
      var mx = 0.0
      var t = 0
      while (t < 12) { val a = math.abs(sb(t)(k)); if (a > mx) mx = a; t += 1 }
      peak(k) = mx
      var i = 62
      while (i > 0 && ScaleFactors(i) < mx) i -= 1
      sfIdx(k) = i
      k += 1
    }
    // Layer I: alloc code c>0 → nb = c+1 bits, steps = 2^nb − 1 (c ≤ 14)
    val alloc = new Array[Int](32)
    var used = 32 + 16 + 32 * 4
    var progress = true
    while (progress) {
      progress = false
      var bestBand = -1
      var bestMnr = Double.NegativeInfinity
      var bestCost = 0
      var kk = 0
      while (kk < 32) {
        if (peak(kk) > 0 && alloc(kk) < 14) {
          val cur = alloc(kk)
          val cost = (if (cur == 0) 6 + 12 * 2 else 12) // first step: sf + 12×2 bits; then +1 bit/sample
          if (used + cost <= frameBytes * 8) {
            val sigDb = 20.0 * StrictMath.log10(peak(kk) + 1e-10)
            val curSnr = if (cur == 0) 0.0 else 20.0 * StrictMath.log10(((1 << (cur + 1)) - 1).toDouble)
            val mnr = sigDb - curSnr
            if (mnr > bestMnr) { bestMnr = mnr; bestBand = kk; bestCost = cost }
          }
        }
        kk += 1
      }
      if (bestBand >= 0) { alloc(bestBand) += 1; used += bestCost; progress = true }
    }
    val w = new BitWriter(out)
    w.pos = off * 8
    w.put(0xfff, 12); w.put(1, 1); w.put(3, 2) // layer I = '11'
    w.put(0, 1); w.put(bitrateIndex, 4); w.put(1, 2); w.put(0, 1); w.put(0, 1)
    w.put(3, 2); w.put(0, 2); w.put(0, 1); w.put(1, 1); w.put(0, 2)
    val crcPos = w.pos
    w.put(0, 16)
    val protFrom = w.pos
    var kk = 0
    while (kk < 32) { w.put(alloc(kk), 4); sum.add(alloc(kk)); kk += 1 }
    val protTo = w.pos
    kk = 0
    while (kk < 32) {
      if (alloc(kk) > 0) { w.put(sfIdx(kk), 6); sum.add(sfIdx(kk)) }
      kk += 1
    }
    var t = 0
    while (t < 12) {
      kk = 0
      while (kk < 32) {
        if (alloc(kk) > 0) {
          val qu = QuantL1(alloc(kk))
          val v = quantize(sb(t)(kk) / ScaleFactors(sfIdx(kk)), qu)
          w.put(v, qu.nb); sum.add(v)
        }
        kk += 1
      }
      t += 1
    }
    require(w.pos <= (off + frameBytes) * 8, "Layer I frame overflow")
    var crc = crc16(out, off * 8 + 16, 16)
    crc = crc16(out, protFrom, protTo - protFrom, crc)
    val wc = new BitWriter(out)
    wc.pos = crcPos
    wc.put(crc, 16)
  }

  // ---------------------------------------------------------------------
  // Decode (both layers)
  // ---------------------------------------------------------------------

  /** Decode a whole MPEG-1 audio stream (Layer I or II frames, 48 kHz
    * mono, CRC-protected). Returns None on any malformed frame: bad sync,
    * reserved field, CRC mismatch, truncation — the fail-soft contract
    * every codec here obeys (hostile bytes cost the row, never the task).
    */
  def decodeSamples(p: Array[Byte]): Option[Array[Short]] =
    decodeSamplesWithSum(p).map(_._1)

  /** [[decodeSamples]] plus the recomputed side-info/code checksum (read
    * order mirrors the encoder's write order — see encodeL2WithSum).
    */
  def decodeSamplesWithSum(p: Array[Byte]): Option[(Array[Short], Long)] = {
    try {
      val syn = new Synthesis
      val sum = new CodeSum
      val outBuf = scala.collection.mutable.ArrayBuffer.empty[Short]
      var pos = 0
      if (p.length < 4) return None
      while (pos + 4 <= p.length) {
        // header
        if ((p(pos) & 0xff) != 0xff || ((p(pos + 1) >> 5) & 7) != 7) return None
        val id = (p(pos + 1) >> 3) & 1
        val layer = (p(pos + 1) >> 1) & 3
        val prot = p(pos + 1) & 1
        val brIdx = (p(pos + 2) >> 4) & 0xf
        val fsIdx = (p(pos + 2) >> 2) & 3
        val padding = (p(pos + 2) >> 1) & 1
        val mode = (p(pos + 3) >> 6) & 3
        if (id != 1 || fsIdx != 1 || mode != 3 || prot != 0) return None
        if (brIdx < 1 || brIdx > 14) return None
        val frameBytes = layer match {
          case 2 => 144 * (BitratesL2(brIdx) * 1000) / SampleRate + padding
          case 3 => (12 * (BitratesL1(brIdx) * 1000) / SampleRate + padding) * 4
          case _ => return None
        }
        if (pos + frameBytes > p.length) return None
        val r = new BitReader(p, (pos + frameBytes) * 8)
        r.pos = pos * 8 + 32
        val crcStored = r.get(16)
        val protFrom = r.pos
        val protEnd = new ProtEnd
        val pcm =
          if (layer == 2) decodeL2Frame(r, syn, protEnd, sum)
          else decodeL1Frame(r, syn, protEnd, sum)
        if (pcm == null || !r.ok) return None
        // verify CRC over header bits 16..31 + the protected side info
        var crc = crc16(p, pos * 8 + 16, 16)
        crc = crc16(p, protFrom, protEnd.bit - protFrom, crc)
        if (crc != crcStored) return None
        outBuf ++= pcm
        pos += frameBytes
      }
      if (pos != p.length) return None // trailing bytes after the last frame
      if (outBuf.isEmpty) None else Some((outBuf.toArray, sum.value))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** per-call holder for the exclusive end of the CRC-protected region
    * (decode runs concurrently on executor threads — no shared state)
    */
  private final class ProtEnd { var bit = 0 }

  private def decodeL2Frame(r: BitReader, syn: Synthesis, protEnd: ProtEnd, sum: CodeSum): Array[Short] = {
    val alloc = new Array[Int](SbLimit)
    var k = 0
    while (k < SbLimit) {
      alloc(k) = r.get(TableB2a(k).nbal); sum.add(alloc(k)); k += 1
    }
    val scfsi = new Array[Int](SbLimit)
    k = 0
    while (k < SbLimit) {
      if (alloc(k) > 0) { scfsi(k) = r.get(2); sum.add(scfsi(k)) }
      k += 1
    }
    protEnd.bit = r.pos
    val sf = Array.ofDim[Int](SbLimit, 3)
    k = 0
    while (k < SbLimit) {
      if (alloc(k) > 0) {
        scfsi(k) match {
          case 0 =>
            sf(k)(0) = r.get(6); sf(k)(1) = r.get(6); sf(k)(2) = r.get(6)
            sum.add(sf(k)(0)); sum.add(sf(k)(1)); sum.add(sf(k)(2))
          case 1 =>
            sf(k)(0) = r.get(6); sf(k)(1) = sf(k)(0); sf(k)(2) = r.get(6)
            sum.add(sf(k)(0)); sum.add(sf(k)(2))
          case 2 =>
            sf(k)(0) = r.get(6); sf(k)(1) = sf(k)(0); sf(k)(2) = sf(k)(0)
            sum.add(sf(k)(0))
          case 3 =>
            sf(k)(0) = r.get(6); sf(k)(1) = r.get(6); sf(k)(2) = sf(k)(1)
            sum.add(sf(k)(0)); sum.add(sf(k)(1))
        }
        // (alloc can never exceed steps.length: each band class's nbal
        // width exactly bounds its quantizer list, 2^nbal - 1 == length)
        if (sf(k)(0) > 62 || sf(k)(1) > 62 || sf(k)(2) > 62) { r.ok = false; return null }
      }
      k += 1
    }
    val out = new Array[Short](1152)
    var g = 0
    while (g < 12) {
      val cols = Array.fill(3)(new Array[Double](32))
      k = 0
      while (k < SbLimit) {
        if (alloc(k) > 0) {
          val qu = QuantBySteps(TableB2a(k).steps(alloc(k) - 1))
          val s = ScaleFactors(sf(k)(g / 4))
          if (qu.groupBits > 0) {
            var code = r.get(qu.groupBits)
            var j = 0
            while (j < 3) {
              val v = code % qu.steps
              cols(j)(k) = dequantize(v, qu) * s
              sum.add(v)
              code /= qu.steps
              j += 1
            }
            if (code != 0) { r.ok = false; return null } // >steps^3-1: invalid
          } else {
            var j = 0
            while (j < 3) {
              val v = r.get(qu.nb)
              if (v >= qu.steps) { r.ok = false; return null }
              cols(j)(k) = dequantize(v, qu) * s
              sum.add(v)
              j += 1
            }
          }
        }
        k += 1
      }
      if (!r.ok) return null
      var j = 0
      while (j < 3) {
        val pcm = syn.feed(cols(j))
        var i = 0
        while (i < 32) {
          out(g * 96 + j * 32 + i) = clampPcm(pcm(i))
          i += 1
        }
        j += 1
      }
      g += 1
    }
    out
  }

  private def decodeL1Frame(r: BitReader, syn: Synthesis, protEnd: ProtEnd, sum: CodeSum): Array[Short] = {
    val alloc = new Array[Int](32)
    var k = 0
    while (k < 32) {
      alloc(k) = r.get(4)
      if (alloc(k) == 15) { r.ok = false; return null } // forbidden
      sum.add(alloc(k))
      k += 1
    }
    protEnd.bit = r.pos
    val sf = new Array[Int](32)
    k = 0
    while (k < 32) {
      if (alloc(k) > 0) {
        sf(k) = r.get(6)
        if (sf(k) > 62) { r.ok = false; return null }
        sum.add(sf(k))
      }
      k += 1
    }
    val out = new Array[Short](384)
    var t = 0
    while (t < 12) {
      val col = new Array[Double](32)
      k = 0
      while (k < 32) {
        if (alloc(k) > 0) {
          val qu = QuantL1(alloc(k))
          val v = r.get(qu.nb)
          if (v >= qu.steps) { r.ok = false; return null }
          col(k) = dequantize(v, qu) * ScaleFactors(sf(k))
          sum.add(v)
        }
        k += 1
      }
      if (!r.ok) return null
      val pcm = syn.feed(col)
      var i = 0
      while (i < 32) { out(t * 32 + i) = clampPcm(pcm(i)); i += 1 }
      t += 1
    }
    out
  }

  /** Side-info walk of a Layer II stream: per-quantizer band-usage counts
    * (by step count) and scfsi histogram across all frames — the spec pins
    * that low-rate encodes actually exercise GROUPED quantizers and that
    * scalefactor sharing occurs on steady content. Returns None on any
    * malformed frame.
    */
  def l2SideInfo(p: Array[Byte]): Option[(Map[Int, Int], Map[Int, Int])] = {
    try {
      var quant = Map.empty[Int, Int].withDefaultValue(0)
      var scf = Map.empty[Int, Int].withDefaultValue(0)
      var pos = 0
      if (p.length < 4) return None
      while (pos + 4 <= p.length) {
        if ((p(pos) & 0xff) != 0xff || ((p(pos + 1) >> 5) & 7) != 7) return None
        if (((p(pos + 1) >> 1) & 3) != 2) return None // Layer II only
        // same header validation as decodeSamplesWithSum: the 48 kHz
        // frame-length arithmetic below is only correct for fsIdx 1
        if (((p(pos + 1) >> 3) & 1) != 1 || (p(pos + 1) & 1) != 0) return None
        if (((p(pos + 2) >> 2) & 3) != 1) return None
        if (((p(pos + 3) >> 6) & 3) != 3) return None
        val brIdx = (p(pos + 2) >> 4) & 0xf
        if (brIdx < 1 || brIdx > 14) return None
        val padding = (p(pos + 2) >> 1) & 1
        val frameBytes = 144 * (BitratesL2(brIdx) * 1000) / SampleRate + padding
        if (pos + frameBytes > p.length) return None
        val r = new BitReader(p, (pos + frameBytes) * 8)
        r.pos = pos * 8 + 48 // skip header + CRC
        val alloc = new Array[Int](SbLimit)
        var k = 0
        while (k < SbLimit) { alloc(k) = r.get(TableB2a(k).nbal); k += 1 }
        k = 0
        while (k < SbLimit) {
          if (alloc(k) > 0) {
            quant = quant.updated(TableB2a(k).steps(alloc(k) - 1),
              quant(TableB2a(k).steps(alloc(k) - 1)) + 1)
            val s = r.get(2)
            scf = scf.updated(s, scf(s) + 1)
          }
          k += 1
        }
        if (!r.ok) return None
        pos += frameBytes
      }
      Some((quant, scf))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def clampPcm(x: Double): Short = {
    val v = StrictMath.rint(x * 32768.0)
    (if (v > 32767.0) 32767 else if (v < -32768.0) -32768 else v.toInt).toShort
  }

  /** SNR (dB) of decoded vs original PCM with the codec's 481-sample
    * alignment; +inf-free (capped at 150) and deterministic.
    */
  def snrDb(orig: Array[Short], dec: Array[Short]): Double = {
    val n = math.min(orig.length, math.max(0, dec.length - CodecDelay))
    if (n <= 0) return 0.0
    var sig = 0.0
    var err = 0.0
    var i = 0
    while (i < n) {
      val a = orig(i).toDouble
      val e = a - dec(i + CodecDelay)
      sig += a * a
      err += e * e
      i += 1
    }
    if (sig == 0.0) return if (err == 0.0) 150.0 else 0.0
    math.min(150.0, 10.0 * StrictMath.log10(sig / math.max(err, 1e-300)))
  }
}

/** Registered queries for the MPEG-1 audio family. */
object MpegAudioQueries {
  import MpegAudioCodec._

  final case class MpegContent(doc_id: Long, n_bytes: Int, n_samples_in: Int,
      l2_frames: Int, l2_bytes: Int, l2_stream_ok: Boolean, l2_snr_ok: Boolean,
      l1_frames: Int, l1_bytes: Int, l1_stream_ok: Boolean, l1_snr_ok: Boolean)

  /** Perceptual-audio decode end-to-end: payload → 16-bit PCM → MPEG-1
    * Layer II AND Layer I encode (32-band analysis, scalefactors, dynamic
    * bit allocation, CRC) → full decode (parse, requantize, polyphase
    * synthesis) → fidelity vs the original. Lossy by design, so unlike
    * FLAC (q269) the PCM is NOT a closed form of the text: the oracle
    * gates the closed-form structure (frame counts and stream sizes from
    * the ISO frame-length arithmetic) plus the achieved-fidelity
    * properties (SNR > 12 dB for Layer II at 192 kbps — mono's ISO
    * ceiling — and > 30 dB for Layer I at 448 kbps, through the real
    * filterbank cascade on the one-pole-shaped signal; a wrong window,
    * matrix, scalefactor, or allocation path lands near 0 dB and fails
    * both), the q267 `sketch_ok` oracle discipline. Bit-level
    * correctness is spec-pinned in MpegAudioSpec instead. Map-only,
    * partition-parallel, payloads never on the driver.
    */
  def decodeContentMpeg(media: Dataset[MediaRow]): Dataset[MpegContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // audio-like band-limited test signal: one-pole lowpass over the
        // byte stream (real program material is never spectrally white;
        // the rolloff is what lets the perceptual allocation concentrate
        // bits where the energy is, same reason FLAC's spec content is
        // tonal). Deterministic double arithmetic, same on any executor.
        val pcm = new Array[Short](math.max(1, r.payload.length))
        var acc = 0.0
        var i = 0
        while (i < r.payload.length) {
          acc = 0.85 * acc + 0.45 * (((r.payload(i) & 0xff) - 128) * 256)
          val v = StrictMath.rint(acc)
          pcm(i) = (if (v > 32767) 32767 else if (v < -32768) -32768 else v.toInt).toShort
          i += 1
        }
        val (l2, l2sum) = encodeL2WithSum(pcm)
        val (l2dec, l2decSum) = decodeSamplesWithSum(l2)
          .getOrElse(throw new IllegalStateException("L2 roundtrip failed"))
        val (l1, l1sum) = encodeL1WithSum(pcm)
        val (l1dec, l1decSum) = decodeSamplesWithSum(l1)
          .getOrElse(throw new IllegalStateException("L1 roundtrip failed"))
        MpegContent(r.doc_id, r.payload.length, pcm.length,
          (pcm.length + CodecDelay + 1151) / 1152, l2.length,
          l2sum == l2decSum, snrDb(pcm, l2dec) > 12.0,
          (pcm.length + CodecDelay + 383) / 384, l1.length,
          l1sum == l1decSum, snrDb(pcm, l1dec) > 30.0)
      }
    }
  }

  val q277MpegAudioDecode = GraftQuery(
    "q277_mpeg_audio_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentMpeg(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("n_samples_in"),
          col("l2_frames"), col("l2_bytes"), col("l2_stream_ok"), col("l2_snr_ok"),
          col("l1_frames"), col("l1_bytes"), col("l1_stream_ok"), col("l1_snr_ok"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
           |  CAST(greatest(1, octet_length(CAST(text AS BLOB))) AS INT) AS n_samples_in,
           |  CAST((greatest(1, octet_length(CAST(text AS BLOB))) + 481 + 1151) // 1152 AS INT)
           |    AS l2_frames,
           |  CAST(((greatest(1, octet_length(CAST(text AS BLOB))) + 481 + 1151) // 1152) * 576
           |    AS INT) AS l2_bytes,
           |  TRUE AS l2_stream_ok,
           |  TRUE AS l2_snr_ok,
           |  CAST((greatest(1, octet_length(CAST(text AS BLOB))) + 481 + 383) // 384 AS INT)
           |    AS l1_frames,
           |  CAST(((greatest(1, octet_length(CAST(text AS BLOB))) + 481 + 383) // 384) * 448
           |    AS INT) AS l1_bytes,
           |  TRUE AS l1_stream_ok,
           |  TRUE AS l1_snr_ok
           |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q277MpegAudioDecode)
}

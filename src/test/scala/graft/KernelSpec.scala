package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel._

/** Kernel unit tests pinned to the reference's assertion-goldens
  * (reference spec/rika/parser_spec.rb and
  * spec/integration/document_processing_spec.rb) over the vendored fixture
  * corpus. No Spark involved — pure kernels.
  */
class KernelSpec extends AnyFunSuite {

  def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  val poemTitle = "Stopping by Woods on a Snowy Evening"

  // ------------------------------------------------------------ detection
  test("D1: magic-byte sniffing across the fixture corpus") {
    assert(Magic.sniff(fixture("document.pdf")) == Magic.Kind.Pdf)
    assert(Magic.sniff(fixture("document.docx")) == Magic.Kind.Docx)
    assert(Magic.sniff(fixture("document.doc")) == Magic.Kind.Doc)
    assert(Magic.sniff(fixture("image.jpg")) == Magic.Kind.Jpeg)
    // extensionless jpeg still detected (spec/rika/parser_spec.rb:143-146)
    assert(Magic.sniff(fixture("image_jpg_without_extension")) == Magic.Kind.Jpeg)
    assert(Magic.sniff(fixture("document.txt")) == Magic.Kind.Text)
    // unknown magic -> octet-stream (spec/rika/parser_spec.rb:236-238)
    assert(Magic.sniff(fixture("unknown.bin")) == Magic.Kind.Unknown)
  }

  test("D2: charset detection") {
    assert(Charset.detect(fixture("document.txt")).name == "UTF-8")
    assert(Charset.detect(fixture("ru.txt")).name == "UTF-8")
    val latin1 = Array[Byte]('c'.toByte, 'a'.toByte, 'f'.toByte, 0xe9.toByte)
    assert(Charset.detect(latin1).name == "ISO-8859-1")
    assert(Charset.detect(latin1).decoded == "café")
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, 'h'.toByte, 'i'.toByte)
    assert(Charset.detect(bom).name == "UTF-8")
    assert(Charset.detect(bom).decoded == "hi")
  }

  test("D2: BOM-less UTF-16 (Windows-export shape) detected by NUL parity") {
    val text = "The quick brown fox jumps over the lazy dog, twice."
    val le = text.getBytes("UTF-16LE")
    val be = text.getBytes("UTF-16BE")
    // interleaved NULs are technically valid UTF-8, so without the
    // parity census these would decode as NUL-riddled garbage
    assert(Charset.isValidUtf8(le, le.length))
    assert(Charset.detect(le).name == "UTF-16LE")
    assert(Charset.detect(le).decoded == text)
    assert(Charset.detect(be).name == "UTF-16BE")
    assert(Charset.detect(be).decoded == text)
    // non-Latin UTF-16 (few NULs) falls through without harm
    val ru = "Это текст на русском языке, в нём есть слова."
    assert(Charset.detect(ru.getBytes("UTF-8")).name == "UTF-8")
    // short or NUL-sparse inputs never trip the heuristic
    assert(Charset.detect("plain ascii text".getBytes("UTF-8")).name == "UTF-8")
    assert(Charset.detect(Array[Byte]('a', 0, 'b')).name == "UTF-8")
    // full extract path: a BOM-less UTF-16LE payload surfaces its text
    val out = Extract.extractBytes("note.txt", le, Extract.Options())
    assert(out.contentType == "text/plain; charset=UTF-16LE")
    assert(out.content.startsWith("The quick brown fox"))
  }

  test("D3: Kazakh via Cyrillic additions (beats the і+ы Belarusian rule)") {
    assert(Lang.detect("Бұл қазақ тілінде жазылған мәтін, онда көптеген сөздер бар.") == "kk")
    // the be/uk/ru rules stay intact
    assert(Lang.detect("Гэта тэкст на беларускай мове, у якім ёсць шмат слоў і таксама сказаў пра ўсё.") == "be")
    assert(Lang.detect("Це текст українською мовою, він має багато слів і речень.") == "uk")
  }

  test("D3: census-only scripts — am/km/lo/si/my (58 languages + und)") {
    assert(Lang.detect("ይህ በአማርኛ የተጻፈ ጽሑፍ ነው እና ብዙ ቃላት አሉት።") == "am")
    assert(Lang.detect("នេះជាអត្ថបទដែលសរសេរជាភាសាខ្មែរ ហើយមានពាក្យច្រើន។") == "km")
    assert(Lang.detect("ນີ້ແມ່ນບົດເລື່ອງທີ່ຂຽນເປັນພາສາລາວ ແລະມີຄຳຫຼາຍຄຳ.") == "lo")
    assert(Lang.detect("මෙය සිංහල භාෂාවෙන් ලියන ලද පාඨයකි, වචන බොහෝය.") == "si")
    assert(Lang.detect("ဤသည်မှာ မြန်မာဘာသာဖြင့် ရေးသားထားသော စာသားဖြစ်သည်။") == "my")
    // neighbors unaffected
    assert(Lang.detect("นี่คือข้อความภาษาไทยที่มีคำมากมายหลายคำ") == "th")
    assert(Lang.detect("இது தமிழில் எழுதப்பட்ட ஒரு உரை ஆகும்.") == "ta")
  }

  test("D3: fourth breadth batch — uz/az/tl/sw Latin, mn Cyrillic (65 languages + und)") {
    // Uzbek: va/uchun/bilan/emas + o'/g' apostrophe orthography
    assert(Lang.detect(
      "Bu matn o'zbek tilida yozilgan va unda juda ko'p so'zlar bor, lekin hozir faqat bir misol uchun kerak.") == "uz")
    // Azerbaijani: ə density + və/üçün/ilə (Turkish writes ve/için/ile)
    assert(Lang.detect(
      "Bu mətn Azərbaycan dilində yazılmışdır və onda çox söz var, amma indi yalnız bir nümunə üçün lazımdır.") == "az")
    // Turkish regression guard: the tr fixture must not drift to uz/az
    assert(Lang.detect(
      "Bu bir Türkçe metin ve içinde çok kelime var, ama şimdi sadece bir örnek için gerekli değil mi.") == "tr")
    // Tagalog: ang/ng/mga are unshared anywhere in the set
    assert(Lang.detect(
      "Ito ang teksto sa wikang Tagalog at may mga salita ito na hindi lang para sa isang halimbawa ngayon.") == "tl")
    // Swahili: katika/kwa/kwamba/sana
    assert(Lang.detect(
      "Hii ni maandishi ya lugha ya Kiswahili na ndani yake kuna maneno mengi sana, lakini sasa ni kwa mfano tu.") == "sw")
    // Mongolian Cyrillic: ө/ү without the Kazakh-unique letters
    assert(Lang.detect(
      "Энэ бол монгол хэлээр бичигдсэн текст юм, одоо өвөл болж байна, үдэш нь хүйтэн байсан гэж би бодож байна.") == "mn")
    // Kazakh regression guard: қ/ғ/ұ/ә must still win over the ө/ү rule
    assert(Lang.detect("Бұл қазақ тілінде жазылған мәтін, онда көптеген сөздер бар.") == "kk")
    // ru/be/uk unaffected by the mn branch
    assert(Lang.detect("Это текст на русском языке, в нём есть много слов и предложений.") == "ru")
    // Indonesian guard against tl (Austronesian neighbor)
    assert(Lang.detect(
      "Ini adalah teks dalam bahasa Indonesia yang memiliki banyak kata, tetapi sekarang hanya untuk contoh saja.") == "id")
  }

  test("D3: language detection exact for the 5 fixture languages (spec/rika/parser_spec.rb:252-259)") {
    for ((f, code) <- Seq("en.txt" -> "en", "de.txt" -> "de", "fr.txt" -> "fr",
        "es.txt" -> "es", "ru.txt" -> "ru")) {
      val text = new String(fixture(f), "UTF-8")
      assert(Lang.detect(text) == code, s"fixture $f")
    }
  }

  test("D3: undeterminable text -> und (lang_cant_be_determined.txt)") {
    assert(Lang.detect(new String(fixture("lang_cant_be_determined.txt"), "UTF-8")) == "und")
    assert(Lang.detect("") == "und")
    assert(Lang.detect("zzz qqq xxx") == "und")
  }

  test("D3: breadth tier — pt/it/nl function words, zh/ja/ko/ar/ru script evidence") {
    assert(Lang.detect(
      "A floresta não é uma aldeia, mas foi muito já com ele no inverno.") == "pt")
    assert(Lang.detect(
      "Il bosco non è come il villaggio, ma è molto bello per ogni cavallo.") == "it")
    assert(Lang.detect(
      "Het paard en de sneeuw zijn niet voor het dorp, maar voor de winter.") == "nl")
    assert(Lang.detect("森林的雪在冬天很安静我们都喜欢这个村庄") == "zh")
    assert(Lang.detect("森の雪は冬にとても静かです私たちはこの村が好きです") == "ja")
    assert(Lang.detect("겨울 숲의 눈은 마을에서 매우 조용하다") == "ko")
    assert(Lang.detect("الثلج في الغابة هادئ جدا في الشتاء") == "ar")
    // kana presence separates ja from zh even under kanji dominance
    assert(Lang.detect("森林村馬雪冬です、これはとても静かです") == "ja")
    // original 5 remain exact (regression guard against profile collisions)
    assert(Lang.detect("El bosque y la nieve son de la aldea, sin su caballo.") == "es")
    assert(Lang.detect("Le cheval et la neige sont dans le bois pour le village.") == "fr")
  }

  test("D3: continuation breadth — sv/pl/tr profiles, el/he/th/hi/ta/bn/ka/hy scripts") {
    assert(Lang.detect(
      "Det här är en text på svenska och den har många ord som är vanliga.") == "sv")
    assert(Lang.detect(
      "To jest tekst napisany po polsku, który zawiera wiele słów oraz zdań.") == "pl")
    assert(Lang.detect(
      "Bu Türkçe yazılmış bir metindir ve her şey için çok kelime var.") == "tr")
    assert(Lang.detect("Αυτό είναι ένα κείμενο στα ελληνικά με πολλές λέξεις.") == "el")
    assert(Lang.detect("זהו טקסט בעברית עם מילים רבות ומשפטים שלמים.") == "he")
    assert(Lang.detect("นี่คือข้อความภาษาไทยที่มีคำมากมายหลายคำ") == "th")
    assert(Lang.detect("यह हिंदी में लिखा गया एक पाठ है जिसमें कई शब्द हैं।") == "hi")
    assert(Lang.detect("இது தமிழில் எழுதப்பட்ட ஒரு உரை ஆகும்.") == "ta")
    assert(Lang.detect("এটি বাংলা ভাষায় লেখা একটি পাঠ্য।") == "bn")
    assert(Lang.detect("ეს არის ქართულად დაწერილი ტექსტი.") == "ka")
    assert(Lang.detect("Սա հայերեն գրված տեքստ է եւ շատ բառեր ունի։") == "hy")
    // germanic neighbors stay put: Dutch must not pay into the Swedish
    // score ("en"), German must not land on sv/pl
    assert(Lang.detect(
      "Het paard en de sneeuw zijn niet voor het dorp, maar voor de winter en en en.") == "nl")
    assert(Lang.detect(
      "Der Wald und das Pferd sind nicht im Dorf, aber der Schnee ist noch da.") == "de")
  }

  test("D3: within-script distinguishers — uk vs ru, fa/ur vs ar") {
    // Ukrainian: і/ї/є present, ы/э absent
    assert(Lang.detect("Це текст українською мовою, він має багато слів і речень.") == "uk")
    // Russian: ы/э present -> stays ru even with shared Cyrillic
    assert(Lang.detect("Это текст на русском языке, в нём есть много слов и предложений.") == "ru")
    // Persian: پ/چ/گ additions to the Arabic script
    assert(Lang.detect("این یک متن فارسی است که چند واژه و گفتار دارد.") == "fa")
    // Urdu: ے/ں additions
    assert(Lang.detect("یہ اردو میں لکھا گیا ایک متن ہے جس میں بہت سے الفاظ ہیں۔") == "ur")
    // plain Arabic unchanged
    assert(Lang.detect("الثلج في الغابة هادئ جدا في الشتاء") == "ar")
  }

  test("D3: round-4 breadth — da/no/fi/cs/hu/ro/id/vi profiles, bg vs ru") {
    // Danish vs Norwegian separate on orthographic doublets:
    // da af/efter/hvad/ud/lidt vs no av/etter/hva/ut/litt
    assert(Lang.detect(
      "Han ville ikke være i skoven efter aftenen, men hvad med lidt sne og også hesten ud af landsbyen.") == "da")
    assert(Lang.detect(
      "Han ville ikke være i skogen etter kvelden, men hva med litt snø og også hesten ut av landsbyen.") == "no")
    assert(Lang.detect(
      "Tämä on suomeksi kirjoitettu teksti, jossa on paljon sanoja ja myös lauseita, mutta ei kaikkia.") == "fi")
    assert(Lang.detect(
      "To je text napsaný česky, když ještě není večer a může být velmi chladno mezi stromy.") == "cs")
    assert(Lang.detect(
      "Ez egy magyarul írt szöveg, amely nagyon sok szót tartalmaz és még mondatokat is, de nem minden van itt.") == "hu")
    assert(Lang.detect(
      "Acesta este un text scris în română care are foarte multe cuvinte și este doar un exemplu fără greșeli.") == "ro")
    assert(Lang.detect(
      "Ini adalah teks yang ditulis dalam bahasa dengan banyak kata dan juga kalimat, tetapi tidak semua orang tahu.") == "id")
    assert(Lang.detect(
      "Đây là một văn bản được viết với rất nhiều từ và cũng có những câu, nhưng không phải người nào cũng biết.") == "vi")
    // Bulgarian: no ы/э/ё, no і/ї/є, but ъ as a running-text vowel
    assert(Lang.detect(
      "Това е текст на български език, който съдържа много думи и също така изречения за пример.") == "bg")
    // Russian stays ru: ы/э present (and ъ rare)
    assert(Lang.detect("Это текст на русском языке, в нём есть много слов и предложений.") == "ru")
    // Swedish regression guard: the Scandinavian triple must not collide
    assert(Lang.detect(
      "Det här är en text på svenska och den har många ord som är vanliga.") == "sv")
    // earlier profiles unaffected (cs \"je\" must not capture French)
    assert(Lang.detect("Le cheval et la neige sont dans le bois pour le village, je ne sais pas.") == "fr")
  }

  test("D3: second breadth batch — sk/sl/hr/et/lv/lt/ca/af (39 languages + und)") {
    // Slovak vs Czech: som/sú/aj/keď/ešte + ľ/ô vs jsem/jsou/když/ještě + ř/ů
    assert(Lang.detect(
      "Toto je text napísaný po slovensky, keď som tu bol a veľmi sa mi páčil, ešte aj sú tu slová.") == "sk")
    assert(Lang.detect(
      "To je text napsaný česky, když ještě není večer a může být velmi chladno mezi stromy.") == "cs")
    assert(Lang.detect(
      "To je besedilo v slovenščini, ki ima zelo veliko besed, pa tudi samo nekaj stavkov, kot še kaj.") == "sl")
    assert(Lang.detect(
      "Ovo je tekst koji je napisan vrlo pažljivo, ali još ne znamo što može biti samo jer kao primjer.") == "hr")
    // Estonian vs Finnish: aga/kui/siis/väga/või vs mutta/kun/sitten
    assert(Lang.detect(
      "See on eesti keeles kirjutatud tekst, aga kui siis väga palju sõnu on, siis see ei ole kõik.") == "et")
    assert(Lang.detect(
      "Tämä on suomeksi kirjoitettu teksti, jossa on paljon sanoja ja myös lauseita, mutta ei kaikkia.") == "fi")
    assert(Lang.detect(
      "Tas ir teksts latviešu valodā, kas ir ļoti garš un arī tikai kā piemērs, bet vēl jau pēc tam.") == "lv")
    assert(Lang.detect(
      "Tai yra tekstas lietuvių kalba, kuris yra labai ilgas ir taip pat tik kaip pavyzdys, bet dar jau.") == "lt")
    // Catalan vs Spanish: amb/més/però/això/també unique forms
    assert(Lang.detect(
      "Això és un text en català amb més paraules, però també només un exemple, quan són aquí.") == "ca")
    assert(Lang.detect("El bosque y la nieve son de la aldea, sin su caballo.") == "es")
    // Afrikaans vs Dutch: ek/jy/hulle/baie/vir/nie vs ik/je/hun/veel/voor/niet
    assert(Lang.detect(
      "Hierdie is baie woorde wat ek en jy en hulle vir die toets gaan skryf, om te sien of dit werk, nie waar nie.") == "af")
    assert(Lang.detect(
      "Het paard en de sneeuw zijn niet voor het dorp, maar voor de winter.") == "nl")
  }

  test("D3: third breadth batch — sr/mk/be Cyrillic, is/ga/cy/mt/sq/eu/gl Latin") {
    // Serbian: ј/љ/њ/ћ/ђ branch letters, no Macedonian ѓ/ќ/ѕ
    assert(Lang.detect(
      "Ово је текст који је написан веома пажљиво, јер ће снег у шуми бити њихов пример.") == "sr")
    // Macedonian: ѓ/ќ/ѕ present alongside the shared ј/љ/њ
    assert(Lang.detect(
      "Ова е текст што ќе биде напишан внимателно, зашто ѓаволски убаво е да се најде ѕвезда над селото.") == "mk")
    // Belarusian: ў, and і coexisting with ы
    assert(Lang.detect(
      "Гэта тэкст на беларускай мове, у якім ёсць шмат слоў і таксама сказаў пра ўсё.") == "be")
    // the uk/ru/bg fixtures must be unaffected by the new branch
    assert(Lang.detect("Це текст українською мовою, він має багато слів і речень.") == "uk")
    assert(Lang.detect("Это текст на русском языке, в нём есть много слов и предложений.") == "ru")
    assert(Lang.detect(
      "Това е текст на български език, който съдържа много думи и също така изречения за пример.") == "bg")
    // Icelandic: þ/ð + unique function words (og/til shared with da/no tie)
    assert(Lang.detect(
      "Það er mjög kalt í skóginum þegar ég og þú erum þar með hestinum, en hann var ekki hér.") == "is")
    // Irish
    assert(Lang.detect(
      "Tá an sneachta sa choill agus níl an capall anseo, ach bhí mé ansin nuair a bhí gach rud ciúin.") == "ga")
    // Welsh
    assert(Lang.detect(
      "Mae yr eira yn y goedwig ond nid yw y ceffyl yma, roedd pawb wedi mynd pan oedd hefyd yn oer.") == "cy")
    // Maltese: ħ/ġ letters + unique function words (il shared with it)
    assert(Lang.detect(
      "Dan huwa test bil-kliem ħafna li kien dejjem hawn, imma qatt ma kien hemm silġ fir-raħal issa.") == "mt")
    // Albanian: ë density + unique function words
    assert(Lang.detect(
      "Ky është një tekst me shumë fjalë që nuk ishte këtu, por tani edhe bora në pyll është vetëm e qetë.") == "sq")
    // Basque
    assert(Lang.detect(
      "Hau testu bat da eta ez da oso luzea, baina beti hemen dago elurra basoan, orain eta gero ere bai.") == "eu")
    // Galician vs Spanish and Portuguese: unha/máis/tamén/xa unique forms
    assert(Lang.detect(
      "Isto é un texto en galego, unha chea de palabras, máis tamén moi pouco, xa que agora sempre está aquí e nunca alí.") == "gl")
    assert(Lang.detect("El bosque y la nieve son de la aldea, sin su caballo.") == "es")
    assert(Lang.detect(
      "Este é um texto em português que não tem muitas palavras, mas já foi um exemplo com ele.") == "pt")
    // Danish/Norwegian regression guard against the Icelandic og/til overlap
    assert(Lang.detect(
      "Han ville ikke være i skoven efter aftenen, men hvad med lidt sne og også hesten ud af landsbyen.") == "da")
    assert(Lang.detect(
      "Han ville ikke være i skogen etter kvelden, men hva med litt snø og også hesten ut av landsbyen.") == "no")
  }

  // ----------------------------------------------------------------- txt
  test("E1: plain text first line + content type (spec/rika/parser_spec.rb:149-151,225-227)") {
    val out = Extract.extractBytes("txt", fixture("document.txt"), Extract.Options())
    assert(out.contentType == "text/plain; charset=UTF-8")
    assert(out.content.linesIterator.next() == poemTitle)
    assert(out.issue.isEmpty)
  }

  test("E8: truncation semantics on txt (spec/rika/parser_spec.rb:164-166)") {
    val out = Extract.extractBytes("txt", fixture("document.txt"), Extract.Options(8))
    assert(out.content == "Stopping")
  }

  test("E8: prefix invariant (document_processing_spec.rb:88-104)") {
    for (f <- Seq("document.txt", "document.pdf", "document.docx"); n <- Seq(0, 1, 9, 50, 1000)) {
      val full = Extract.extractBytes("any", fixture(f), Extract.Options(-1))
      val cut = Extract.extractBytes("any", fixture(f), Extract.Options(n))
      assert(full.content.startsWith(cut.content), s"$f at $n")
      assert(cut.content.length <= n)
    }
  }

  // ----------------------------------------------------------------- pdf
  test("E3: PDF second line is the title, leading newline (spec/rika/parser_spec.rb:157-162)") {
    val out = Extract.extractBytes("pdf", fixture("document.pdf"), Extract.Options())
    assert(out.contentType == "application/pdf")
    val lines = out.content.split("\n", -1)
    assert(out.content.head == '\n')
    assert(lines(1).contains(poemTitle), s"got: ${lines.take(3).mkString("|")}")
    assert(out.issue.isEmpty)
  }

  test("E3: PDF truncation to 9 = \\nStopping (spec/rika/parser_spec.rb:168-170)") {
    val out = Extract.extractBytes("pdf", fixture("document.pdf"), Extract.Options(9))
    assert(out.content == "\nStopping")
  }

  test("E3: PDF metadata (spec/rika/parser_spec.rb:85-92,203-205)") {
    val out = Extract.extractBytes("pdf", fixture("document.pdf"), Extract.Options())
    assert(out.metadata("dc:creator") == "Robert Frost")
    assert(out.metadata("dc:title") == poemTitle)
    assert(out.metadata("dc:format") == "application/pdf; version=1.3")
    assert(out.metadata("pdf:docinfo:creator") == "Robert Frost")
    assert(out.metadata("pdf:docinfo:created") == "D:20200723174639Z00'00'")
    // per-page unmapped-glyph counter present (lib/rika.rb:92-95); the
    // fixture's ToUnicode CMap covers every glyph used
    assert(out.metadata("pdf:unmappedUnicodeCharsPerPage") == "0")
    // both counters absent in metadata-only mode (reference caveat)
    val m0 = Extract.extractBytes("pdf", fixture("document.pdf"), Extract.Options(0))
    assert(!m0.metadata.contains("pdf:charsPerPage"))
    assert(!m0.metadata.contains("pdf:unmappedUnicodeCharsPerPage"))
  }

  test("E3+: embedded DCTDecode image XObject — metadata surfaced, text unchanged, pixels decodable") {
    import graft.corpus.{PdfWriter, PixelGen}
    val stanzas = Vector(Vector("Picture Title"),
      Vector("first line of text", "second line of text", "third line here"),
      Vector("another stanza line", "closing line of text", "final words here"))
    val plain = PdfWriter.Spec("Picture Title", "An Author", stanzas, useKernSpaces = false)
    val imaged = plain.copy(imageSeed = 42L)
    val outPlain = PdfKernel.extract(PdfWriter.write(plain))
    val outImg = PdfKernel.extract(PdfWriter.write(imaged))
    // text identical: the q/cm/Do/Q paint has no text effect
    assert(outImg.text == outPlain.text)
    assert(outImg.text == PdfWriter.expectedText(imaged))
    // image metadata only on the imaged variant
    assert(outPlain.metadata.get("pdf:imageCount").isEmpty)
    assert(outImg.metadata.get("pdf:imageCount").contains("1"))
    assert(outImg.metadata.get("pdf:imageDimensions").contains("64x48"))
    assert(outImg.metadata.get("pdf:imageFilters").contains("DCTDecode"))
    // the embedded stream is a REAL baseline JPEG: pull it out and decode
    val bytes = PdfWriter.write(imaged)
    val hay = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val soi = hay.indexOf("ÿØÿ")
    assert(soi > 0, "embedded JPEG SOI present")
    val jpegBytes = java.util.Arrays.copyOfRange(bytes, soi, bytes.length)
    val img = JpegDecoder.decode(jpegBytes).getOrElse(fail("embedded jpeg decode"))
    assert(img.width == 64 && img.height == 48)
    // decoded plane tracks the analytic source within the q85 loss bound
    val src = PixelGen.bytes(42L, 64 * 48)
    val mae = img.data.zip(src).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / src.length
    assert(mae < 48, s"mae=$mae")
  }

  test("E3++: encrypted PDFs (empty user password) extract transparently — RC4-40, RC4-128, AESV2, AES-256") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Locked Title"),
      Vector("first secret line", "second secret line", "third line here"),
      Vector("another stanza line", "closing line of text", "final words here"))
    val plain = PdfWriter.Spec("Locked Title", "Shy Author", stanzas,
      useKernSpaces = false)
    val outPlain = PdfKernel.extract(PdfWriter.write(plain))
    for (mode <- Seq("rc4-40", "rc4", "aes", "aes256")) {
      val bytes = PdfWriter.write(plain.copy(encrypt = mode))
      // the ciphertext really differs from the plaintext stream bytes
      assert(!java.util.Arrays.equals(bytes, PdfWriter.write(plain)), mode)
      val out = PdfKernel.extract(bytes)
      // unencrypted behavior byte-identical: same text, same metadata
      assert(out.text == outPlain.text, s"$mode text")
      assert(out.text == PdfWriter.expectedText(plain), s"$mode expected")
      assert(out.metadata("dc:title") == "Locked Title", s"$mode title")
      assert(out.metadata("dc:creator") == "Shy Author", s"$mode creator")
      // full Extract path: clean row, no issue
      val ext = Extract.extractBytes("pdf", bytes, Extract.Options())
      assert(ext.issue.isEmpty && ext.content == PdfWriter.expectedText(plain), mode)
    }
    // encrypted + embedded DCTDecode image: stream decrypts, image decodes
    val imgBytes = PdfWriter.write(plain.copy(encrypt = "aes", imageSeed = 42L))
    val outImg = PdfKernel.extract(imgBytes)
    assert(outImg.metadata.get("pdf:imageCount").contains("1"))
    assert(outImg.metadata.get("pdf:imageDimensions").contains("64x48"))
  }

  test("E3++: password-protected PDF degrades to a taxonomy row, not a crash") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("No Entry"), Vector("hidden line one", "hidden line two"))
    val bytes = PdfWriter.write(PdfWriter.Spec("No Entry", "A", stanzas,
      useKernSpaces = false, encrypt = "rc4"))
    // corrupt /U so the empty-password check fails (simulates a real
    // user password): find the U entry's hex string and flip bytes
    val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val uAt = raw.indexOf("/U <")
    assert(uAt > 0)
    val mutated = bytes.clone()
    for (k <- 0 until 8) mutated(uAt + 4 + k) = (if (bytes(uAt + 4 + k) == '0') '1' else '0').toByte
    val out = Extract.extractBytes("pdf", mutated, Extract.Options())
    assert(out.issue.isDefined, "password-protected must be flagged")
    assert(out.content.isEmpty)
    // same for AES-256/R6: corrupt the /U validation hash -> the empty
    // password fails Algorithm 2.B verification -> taxonomy row
    val b256 = PdfWriter.write(PdfWriter.Spec("No Entry", "A", stanzas,
      useKernSpaces = false, encrypt = "aes256"))
    val raw256 = new String(b256, java.nio.charset.StandardCharsets.ISO_8859_1)
    val uAt256 = raw256.indexOf("/U <")
    assert(uAt256 > 0)
    val mut256 = b256.clone()
    for (k <- 0 until 8) mut256(uAt256 + 4 + k) =
      (if (b256(uAt256 + 4 + k) == '0') '1' else '0').toByte
    val out256 = Extract.extractBytes("pdf", mut256, Extract.Options())
    assert(out256.issue.isDefined, "aes256 password-protected must be flagged")
    assert(out256.content.isEmpty)
  }

  test("E3 dates: Info CreationDate/ModDate surface as UTC dcterms ISO 8601") {
    import graft.corpus.PdfWriter
    val bytes = PdfWriter.write(PdfWriter.Spec("Dated Doc", "A",
      Vector(Vector("a line of text here")), useKernSpaces = false))
    val out = PdfKernel.extract(bytes)
    // writer: D:20200723174639+02'00' -> UTC 15:46:39
    assert(out.metadata("dcterms:created") == "2020-07-23T15:46:39Z")
    assert(out.metadata("xmp:CreateDate") == "2020-07-23T15:46:39Z")
    assert(out.metadata("dcterms:modified") == "2020-07-24T08:15:00Z")
    // raw values stay alongside
    assert(out.metadata("pdf:docinfo:created") == "D:20200723174639+02'00'")
    // parser unit shapes: negative offset, missing fields, garbage
    assert(PdfKernel.pdfDateToIso("D:20200101120000-05'30'")
      .contains("2020-01-01T17:30:00Z"))
    assert(PdfKernel.pdfDateToIso("D:2020").contains("2020-01-01T00:00:00Z"))
    assert(PdfKernel.pdfDateToIso("D:20201307000000").isEmpty) // month 13
    assert(PdfKernel.pdfDateToIso("not a date").isEmpty)
    // encrypted docs decrypt the date strings too
    val enc = PdfKernel.extract(PdfWriter.write(PdfWriter.Spec("Dated Doc", "A",
      Vector(Vector("a line of text here")), useKernSpaces = false, encrypt = "aes")))
    assert(enc.metadata("dcterms:created") == "2020-07-23T15:46:39Z")
  }

  test("E3 annots: annotation /Contents + link URIs follow the page; AcroForm fields trail as name: value") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Annotated Title"),
      Vector("first body line", "second body line", "third line here"))
    val plain = PdfWriter.Spec("Annotated Title", "An Author", stanzas,
      useKernSpaces = false)
    val annotated = plain.copy(
      annots = Vector(
        ("Text", "a sticky note remark"),
        ("Highlight", "highlighted passage comment"),
        ("Link", "https://example.org/d/1/0")),
      formFields = Vector(
        ("author", "Form Author"), ("subject", "Form Subject"),
        ("person.first", "Ada"), ("person.last", "Lovelace")))
    val outPlain = PdfKernel.extract(PdfWriter.write(plain))
    val out = PdfKernel.extract(PdfWriter.write(annotated))
    assert(out.text == PdfWriter.expectedText(annotated))
    // page body unchanged; annotation lines then field lines appended
    assert(out.text.startsWith(outPlain.text))
    assert(out.text.stripPrefix(outPlain.text) ==
      "a sticky note remark\nhighlighted passage comment\n" +
        "https://example.org/d/1/0\n" +
        "author: Form Author\nsubject: Form Subject\n" +
        "person.first: Ada\nperson.last: Lovelace\n")
    assert(out.metadata.get("pdf:annotationTypes").contains("Text,Highlight,Link"))
    assert(out.metadata.get("pdf:hasAcroFormFields").contains("true"))
    // absent on the plain doc
    assert(outPlain.metadata.get("pdf:annotationTypes").isEmpty)
    assert(outPlain.metadata.get("pdf:hasAcroFormFields").isEmpty)

    // non-Latin-1 content travels as UTF-16BE hex strings
    val cyr = plain.copy(annots = Vector(("Text", "заметка — привет")),
      formFields = Vector(("имя", "Ада")))
    val outCyr = PdfKernel.extract(PdfWriter.write(cyr))
    assert(outCyr.text.endsWith("заметка — привет\nимя: Ада\n"))

    // encrypted and ObjStm layouts carry the same surface
    for (variant <- Seq(annotated.copy(encrypt = "aes"),
        annotated.copy(xrefStream = true, objStm = true))) {
      val v = PdfKernel.extract(PdfWriter.write(variant))
      assert(v.text == PdfWriter.expectedText(annotated))
      assert(v.metadata.get("pdf:hasAcroFormFields").contains("true"))
    }

    // image object present: annotation numbering shifts past it
    val imgVariant = annotated.copy(imageSeed = 42L)
    val outImg = PdfKernel.extract(PdfWriter.write(imgVariant))
    assert(outImg.text == PdfWriter.expectedText(imgVariant))
    assert(outImg.metadata.get("pdf:imageCount").contains("1"))
  }

  test("E3 outline+attachments: bookmark titles extract in tree order; embedded-file names surface as metadata") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Outlined Title"),
      Vector("first body line", "second body line", "third line here"))
    val plain = PdfWriter.Spec("Outlined Title", "An Author", stanzas,
      useKernSpaces = false)
    val spec = plain.copy(
      outline = Vector((0, "Chapter One"), (1, "Section 1.1"),
        (1, "Раздел 1.2"), (0, "Chapter Two"), (1, "Section 2.1")),
      embeddedFiles = Vector(("invoice.xml", "<inv total='42'/>"),
        ("данные.txt", "payload text")),
      formFields = Vector(("rating", "5")))
    val outPlain = PdfKernel.extract(PdfWriter.write(plain))
    val out = PdfKernel.extract(PdfWriter.write(spec))
    assert(out.text == PdfWriter.expectedText(spec))
    // depth-first title order, before the form fields
    assert(out.text.stripPrefix(outPlain.text) ==
      "Chapter One\nSection 1.1\nРаздел 1.2\nChapter Two\nSection 2.1\n" +
        "rating: 5\n")
    assert(out.metadata.get("pdf:embeddedFileCount").contains("2"))
    assert(out.metadata.get("pdf:embeddedFileNames")
      .contains("invoice.xml,данные.txt"))
    assert(outPlain.metadata.get("pdf:embeddedFileCount").isEmpty)
    // encrypted + modern (ObjStm) layouts carry the same surface
    for (variant <- Seq(spec.copy(encrypt = "aes256"),
        spec.copy(xrefStream = true, objStm = true))) {
      val v = PdfKernel.extract(PdfWriter.write(variant))
      assert(v.text == PdfWriter.expectedText(spec))
      assert(v.metadata.get("pdf:embeddedFileCount").contains("2"))
    }
  }

  test("E3 xmp: /Metadata packet fills dc: holes, Info dict wins overlap") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Xmp Title"),
      Vector("first body line", "second body line", "third line here"))
    val spec = PdfWriter.Spec("Xmp Title", "An Author", stanzas,
      useKernSpaces = false, xmp = true, xmpDescription = "résumé of the doc")
    val out = PdfKernel.extract(PdfWriter.write(spec))
    // Info-derived values unchanged; the XMP-only field surfaces
    assert(out.metadata("dc:title") == "Xmp Title")
    assert(out.metadata("dc:creator") == "An Author")
    assert(out.metadata.get("dc:description").contains("résumé of the doc"))
    assert(out.text == PdfWriter.expectedText(spec))
    // without the packet the key is absent
    val plain = PdfKernel.extract(PdfWriter.write(spec.copy(xmp = false)))
    assert(plain.metadata.get("dc:description").isEmpty)
    // encrypted: metadata stream decrypts like any other
    val enc = PdfKernel.extract(PdfWriter.write(spec.copy(encrypt = "rc4")))
    assert(enc.metadata.get("dc:description").contains("résumé of the doc"))
    // XML escaping round-trips
    val esc = PdfKernel.extract(PdfWriter.write(
      spec.copy(xmpDescription = "a < b & c > d")))
    assert(esc.metadata.get("dc:description").contains("a < b & c > d"))
  }

  test("E3 encoding: no-ToUnicode fonts map via /Encoding WinAnsi + /Differences") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Führer über größe"),
      Vector("déjà vu — café crème", "mañana señor œuvre", "plain ascii line"))
    val base = PdfWriter.Spec("Führer über größe", "An Author", stanzas,
      useKernSpaces = false)
    // name-form /Encoding /WinAnsiEncoding
    val plainEnc = base.copy(fontEncoding = true)
    val out1 = PdfKernel.extract(PdfWriter.write(plainEnc))
    assert(out1.text == PdfWriter.expectedText(plainEnc))
    assert(out1.metadata("pdf:unmappedUnicodeCharsPerPage") == "0")
    // dict-form with /Differences (uniXXXX names on codes 1..4)
    val diffEnc = base.copy(fontEncoding = true, fontDiffs = true)
    val bytes = PdfWriter.write(diffEnc)
    assert(new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("/Differences"))
    val out2 = PdfKernel.extract(bytes)
    assert(out2.text == PdfWriter.expectedText(diffEnc))
    // kern-space + encrypted + modern layouts on the encoding path
    for (variant <- Seq(
        diffEnc.copy(useKernSpaces = true),
        diffEnc.copy(encrypt = "rc4"),
        diffEnc.copy(xrefStream = true, objStm = true))) {
      val v = PdfKernel.extract(PdfWriter.write(variant))
      assert(v.text == PdfWriter.expectedText(diffEnc))
    }
    // AGL-name Differences resolve too (not just uniXXXX): hand-build
    // a /Differences using named glyphs via the writer's uni form is
    // pinned above; here pin the name table through a crafted font
    val crafted = PdfWriter.write(plainEnc)
    val patched = new String(crafted, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("/Encoding /WinAnsiEncoding",
        "/Encoding << /BaseEncoding /WinAnsiEncoding /Differences [ 252 /udieresis 233 /eacute ] >>")
    // same glyphs, explicitly named: text identical
    val out3 = PdfKernel.extract(
      patched.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(out3.text == PdfWriter.expectedText(plainEnc))
  }

  test("E3 inline images: BI..ID <raw binary> EI skips cleanly, text intact") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Inline Title"),
      Vector("line before image", "line after image", "third line here"),
      Vector("another stanza", "closing line here", "final words here"))
    val spec = PdfWriter.Spec("Inline Title", "An Author", stanzas,
      useKernSpaces = false, inlineImage = true)
    val bytes = PdfWriter.write(spec)
    val out = PdfKernel.extract(bytes)
    // the raw payload holds '(' '\' ')' bytes: only a correct EI skip
    // leaves the following text runs parseable
    assert(out.text == PdfWriter.expectedText(spec))
    // composes with the XObject paint and encryption
    val both = spec.copy(imageSeed = 42L, encrypt = "rc4")
    val out2 = PdfKernel.extract(PdfWriter.write(both))
    assert(out2.text == PdfWriter.expectedText(spec))
    assert(out2.metadata.get("pdf:imageCount").contains("1"))
  }

  test("E3 filters: LZWDecode / ASCII85 / RunLength content streams round-trip") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Filter Title"),
      Vector("first coded line", "second coded line", "third line here"))
    val base = PdfWriter.Spec("Filter Title", "An Author", stanzas,
      useKernSpaces = false)
    for (cf <- Seq("lzw", "a85flate", "rl")) {
      val bytes = PdfWriter.write(base.copy(contentFilter = cf))
      val out = PdfKernel.extract(bytes)
      assert(out.text == PdfWriter.expectedText(base), s"contentFilter=$cf")
    }
    // filter primitives round-trip on adversarial shapes
    val rnd = new java.util.Random(7)
    for (n <- Seq(0, 1, 3, 255, 4096, 70000)) {
      val data = new Array[Byte](n)
      rnd.nextBytes(data)
      // low-entropy tail grows the LZW table past a width bump
      if (n >= 4096) java.util.Arrays.fill(data, n / 2, n, 'a'.toByte)
      assert(java.util.Arrays.equals(
        PdfKernel.lzwDecode(PdfWriter.lzwEncode(data), 1), data), s"lzw n=$n")
      assert(java.util.Arrays.equals(
        PdfKernel.ascii85Decode(PdfWriter.ascii85Encode(data)), data), s"a85 n=$n")
      assert(java.util.Arrays.equals(
        PdfKernel.runLengthDecode(PdfWriter.rleEncode(data)), data), s"rle n=$n")
    }
    // ASCII85 'z' shorthand for all-zero groups
    val zeros = new Array[Byte](12)
    val enc = PdfWriter.ascii85Encode(zeros)
    assert(new String(enc, "ISO-8859-1").startsWith("zzz"))
    assert(java.util.Arrays.equals(PdfKernel.ascii85Decode(enc), zeros))
  }

  test("E3 predictors: PNG row filters and TIFF differencing invert exactly") {
    val rnd = new java.util.Random(11)
    val cols = 7
    val rows = 9
    val src = new Array[Byte](cols * rows)
    rnd.nextBytes(src)
    // forward-filter with each PNG tag (independent spec arithmetic)
    for (tag <- 0 to 4) {
      val filtered = new Array[Byte](rows * (cols + 1))
      for (r <- 0 until rows) {
        filtered(r * (cols + 1)) = tag.toByte
        for (i <- 0 until cols) {
          val raw = src(r * cols + i) & 0xff
          val left = if (i > 0) src(r * cols + i - 1) & 0xff else 0
          val up = if (r > 0) src((r - 1) * cols + i) & 0xff else 0
          val ul = if (r > 0 && i > 0) src((r - 1) * cols + i - 1) & 0xff else 0
          val predV = tag match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          filtered(r * (cols + 1) + 1 + i) = (raw - predV).toByte
        }
      }
      val out = PdfKernel.applyPredictor(filtered, 10 + tag, 1, 8, cols)
      assert(java.util.Arrays.equals(out, src), s"png tag $tag")
    }
    // TIFF predictor 2: horizontal differencing
    val diff = src.clone()
    for (r <- 0 until rows; i <- (cols - 1) to 1 by -1)
      diff(r * cols + i) = ((src(r * cols + i) & 0xff) - (src(r * cols + i - 1) & 0xff)).toByte
    assert(java.util.Arrays.equals(PdfKernel.applyPredictor(diff, 2, 1, 8, cols), src))
  }

  test("E3 xref streams: predictor-coded cross-reference streams index without the brute scan") {
    import graft.corpus.PdfWriter
    val stanzas = Vector(Vector("Modern Layout"),
      Vector("first indexed line", "second indexed line", "third line here"),
      Vector("another stanza line", "closing line of text", "final words here"))
    val base = PdfWriter.Spec("Modern Layout", "An Author", stanzas,
      useKernSpaces = false, xrefStream = true)
    for (xf <- Seq("flate-pred", "flate", "lzw-pred")) {
      val bytes = PdfWriter.write(base.copy(xrefFilter = xf))
      // no classic table, no "trailer" keyword in the file at all
      val raw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(!raw.contains("trailer"), xf)
      val xs0 = PdfKernel.xrefStreamDocs.get()
      val bs0 = PdfKernel.bruteScanDocs.get()
      val out = PdfKernel.extract(bytes)
      assert(out.text == PdfWriter.expectedText(base), s"xrefFilter=$xf")
      assert(out.metadata("dc:title") == "Modern Layout", xf)
      // the parse-path counter proves the validated stream chain indexed
      // the document (not the brute header scan)
      assert(PdfKernel.xrefStreamDocs.get() == xs0 + 1, s"$xf took the brute path")
      assert(PdfKernel.bruteScanDocs.get() == bs0, xf)
    }
    // encrypted + xref stream: trailer entries come from the XRef dict
    // (which itself stays unencrypted), content still decrypts
    for (mode <- Seq("rc4", "aes", "aes256")) {
      val bytes = PdfWriter.write(base.copy(encrypt = mode))
      val xs0 = PdfKernel.xrefStreamDocs.get()
      val out = PdfKernel.extract(bytes)
      assert(out.text == PdfWriter.expectedText(base), s"xref+$mode")
      assert(out.metadata("dc:title") == "Modern Layout", s"xref+$mode")
      assert(PdfKernel.xrefStreamDocs.get() == xs0 + 1, s"xref+$mode path")
    }
    // ObjStm packing (PDF 1.5+ producer default): dict objects live in
    // a compressed object stream behind type-2 xref rows; text AND the
    // Info metadata (inside the ObjStm) must still surface, through the
    // xref-stream path
    for (xf <- Seq("flate-pred", "lzw-pred")) {
      val bytes = PdfWriter.write(base.copy(objStm = true, xrefFilter = xf))
      val xs0 = PdfKernel.xrefStreamDocs.get()
      val out = PdfKernel.extract(bytes)
      assert(out.text == PdfWriter.expectedText(base), s"objStm $xf")
      assert(out.metadata("dc:title") == "Modern Layout", s"objStm $xf")
      assert(PdfKernel.xrefStreamDocs.get() == xs0 + 1, s"objStm $xf path")
      // the raw file really has no top-level "1 0 obj" (Info is packed)
      assert(!new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("1 0 obj"), s"objStm $xf layout")
    }
    // a corrupted offset entry discards the chain -> brute scan still
    // extracts (robustness over the fast path)
    val bytes = PdfWriter.write(base)
    val broken = bytes.clone()
    // flip a byte inside the deflated xref payload so a validated offset
    // (or the inflate itself) breaks
    val braw = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val streamAt = braw.indexOf("stream", braw.indexOf("/Type /XRef"))
    broken(streamAt + 8) = (broken(streamAt + 8) ^ 0x5a).toByte
    val bs0 = PdfKernel.bruteScanDocs.get()
    val out = PdfKernel.extract(broken)
    assert(out.text == PdfWriter.expectedText(base))
    assert(PdfKernel.bruteScanDocs.get() == bs0 + 1)
  }

  test("RC4 matches the public test vectors (Wikipedia)") {
    import graft.kernel.PdfCrypt
    def hex(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
    assert(hex(PdfCrypt.rc4("Key".getBytes, "Plaintext".getBytes)) ==
      "BBF316E8D940AF0AD3")
    assert(hex(PdfCrypt.rc4("Wiki".getBytes, "pedia".getBytes)) ==
      "1021BF0420")
    assert(hex(PdfCrypt.rc4("Secret".getBytes, "Attack at dawn".getBytes)) ==
      "45A01F645FC35B383552544B9BF5")
  }

  test("E3: PDF body contains the full poem in reading order") {
    val out = Extract.extractBytes("pdf", fixture("document.pdf"), Extract.Options())
    val t = out.content
    assert(t.contains("Whose woods these are I think I know."))
    assert(t.contains("And miles to go before I sleep."))
    // reading order: title before first stanza, first stanza before last
    assert(t.indexOf(poemTitle) < t.indexOf("Whose woods"))
    assert(t.indexOf("Whose woods") < t.indexOf("The woods are lovely"))
  }

  test("E3: PDF 1.5 object streams (ObjStm) are indexed") {
    // hand-crafted: catalog/pages/page dicts live compressed inside an
    // ObjStm; only the content stream and the ObjStm itself are top-level
    import java.util.zip.Deflater
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new Deflater(); d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val inner = "<< /Type /Catalog /Pages 4 0 R >> " +
      "<< /Type /Pages /Kids [ 5 0 R ] /Count 1 >> " +
      "<< /Type /Page /Parent 4 0 R /Contents 6 0 R >>"
    val header = "3 0 4 34 5 75 "
    val stmData = (header + inner).getBytes("ISO-8859-1")
    val packed = deflate(stmData)
    val content = "BT /F1 12 Tf 72 700 Td (Hello ObjStm world) Tj ET".getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"1 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} /Length ${packed.length} /Filter /FlateDecode >>\nstream\n")
    out.write(packed)
    w("\nendstream\nendobj\n")
    w(s"6 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 3 0 R >>\n%%EOF\n")
    val res = Extract.extractBytes("pdf", out.toByteArray, Extract.Options())
    assert(res.contentType == "application/pdf")
    assert(res.content.contains("Hello ObjStm world"), res.content)
  }

  test("E3: Td-positioned words get synthetic spaces (no space glyphs)") {
    val content = ("BT /F1 12 Tf 72 700 Td (Hello) Tj 60 0 Td (world) Tj ET")
      .getBytes("ISO-8859-1")
    val out = new java.io.ByteArrayOutputStream()
    def w(x: String): Unit = out.write(x.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    val res = Extract.extractBytes("pdf", out.toByteArray, Extract.Options())
    assert(res.content.contains("Hello world"), res.content)
  }

  // ---------------------------------------------------------------- docx
  test("E4: DOCX first line + content type (spec/rika/parser_spec.rb:153-155,245-249)") {
    val out = Extract.extractBytes("docx", fixture("document.docx"), Extract.Options())
    assert(out.contentType ==
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document")
    assert(out.content.linesIterator.next() == poemTitle)
  }

  test("E4: DOCX metadata (spec/rika/parser_spec.rb:199-201)") {
    val out = Extract.extractBytes("docx", fixture("document.docx"), Extract.Options())
    assert(out.metadata("meta:page-count") == "1")
    assert(out.metadata("dc:title") == "A simple title")
    assert(out.metadata("meta:word-count") == "127")
  }

  test("E4+: DOCX tables, headers/footers, footnotes (structural breadth)") {
    import graft.corpus.DocxWriter
    val spec = DocxWriter.Spec("Structured Doc", "An Author",
      Vector("first body paragraph", "second body paragraph"), pages = 1,
      tables = Vector(
        Vector(Vector("h1", "h2", "h3"), Vector("a one", "b two", "c three")),
        Vector(Vector("x", "y"))),
      headers = Vector("running page header"),
      footers = Vector("running page footer"),
      footnotes = Vector("a footnote body", "another note"))
    val out = Extract.extractBytes("docx", DocxWriter.write(spec), Extract.Options())
    assert(out.content == DocxWriter.expectedText(spec), out.content)
    // exact surface: headers, body, rows tab-joined, footnotes, footers
    assert(out.content ==
      "running page header\n" +
      "first body paragraph\nsecond body paragraph\n" +
      "h1\th2\th3\na one\tb two\tc three\nx\ty\n" +
      "a footnote body\nanother note\n" +
      "running page footer\n")
    // the separator footnote stubs contribute NOTHING (no blank lines)
    assert(!out.content.contains("\n\n"))
    // a plain spec is byte-identical to the pre-breadth layout
    val plain = DocxWriter.Spec("T", "C", Vector("only body"), 1)
    val pout = Extract.extractBytes("docx", DocxWriter.write(plain), Extract.Options())
    assert(pout.content == "only body\n")
  }

  test("E4: DOCX tabs and breaks become characters") {
    val spec = graft.corpus.DocxWriter.Spec("T", "C", Vector("seed"), 1)
    val base = graft.corpus.DocxWriter.write(spec)
    // splice a run with tab + br via a handcrafted document.xml
    val xml = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
      |<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>
      |</w:body></w:document>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zo = new java.util.zip.ZipOutputStream(bos)
    def add(n: String, d: String, stored: Boolean): Unit = {
      val e = new java.util.zip.ZipEntry(n); e.setTime(0L)
      if (stored) { val b = d.getBytes("UTF-8"); e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(b.length); val c = new java.util.zip.CRC32(); c.update(b); e.setCrc(c.getValue) }
      zo.putNextEntry(e); zo.write(d.getBytes("UTF-8")); zo.closeEntry()
    }
    add("[Content_Types].xml", "<Types xmlns=\"x\"/> word/", stored = true)
    add("word/document.xml", xml, stored = false)
    zo.close()
    val out = Extract.extractBytes("docx", bos.toByteArray, Extract.Options())
    assert(out.content == "a\tb\nc\n", out.content.map(_.toInt).mkString(","))
  }

  // ----------------------------------------------------------------- doc
  test("E5: legacy DOC detection + best-effort text (spec/rika/parser_spec.rb:240-243)") {
    val out = Extract.extractBytes("doc", fixture("document.doc"), Extract.Options())
    assert(out.contentType == "application/msword")
    assert(out.content.contains(poemTitle))
    assert(out.content.contains("And miles to go before I sleep."))
  }

  test("E5: fComplex piece table — out-of-order mixed-encoding pieces, mini-stream 0Table") {
    import graft.corpus.CfbWriter
    val text = "First part of the document.\n\nSecond part — déjà vu naïveté.\n\nThird and final part.\n"
    val bytes = CfbWriter.writeComplex(text)
    assert(Magic.sniff(bytes) == Magic.Kind.Doc)
    val out = Extract.extractBytes("doc", bytes, Extract.Options())
    assert(out.contentType == "application/msword")
    assert(out.content == text, s"got: ${out.content}")
    // the decoy fcMin..fcMac range must NOT leak into the output
    assert(!out.content.contains("DECOY"))
  }

  test("E5+: DOC tables — cell/row marks map onto the tab-joined row convention") {
    import graft.corpus.CfbWriter
    val C = "" + 7.toChar // cell mark; row ends with one more mark (TTP)
    val body = "Intro paragraph before the table.\n" +
      s"Name${C}Role$C$C" + s"Ada${C}Engineer$C$C" + s"Grace${C}Admiral$C$C" +
      "Closing paragraph after.\n"
    val expected = "Intro paragraph before the table.\n" +
      "Name\tRole\nAda\tEngineer\nGrace\tAdmiral\n" +
      "Closing paragraph after.\n"
    // both layouts share the text cleaner: plain fcMin..fcMac range and
    // the fComplex piece table must emit the same table surface
    for (bytes <- Seq(CfbWriter.write(body), CfbWriter.writeComplex(body))) {
      val out = Extract.extractBytes("doc", bytes, Extract.Options())
      assert(out.contentType == "application/msword")
      assert(out.content == expected, s"got: ${out.content}")
    }
  }

  test("E5: DOC SummaryInformation -> dc:title / dc:creator") {
    import graft.corpus.CfbWriter
    val bytes = CfbWriter.write("Body text here.\n",
      title = "Doc Title", author = "Doc Author")
    val out = Extract.extractBytes("doc", bytes, Extract.Options())
    assert(out.contentType == "application/msword")
    assert(out.content.startsWith("Body text here."))
    assert(out.metadata("dc:title") == "Doc Title")
    assert(out.metadata("dc:creator") == "Doc Author")
    assert(out.metadata("meta:author") == "Doc Author")
    // absent stream -> no metadata keys, not a failure
    val plain = Extract.extractBytes("doc", CfbWriter.write("x\n"), Extract.Options())
    assert(!plain.metadata.contains("dc:title"))
  }

  test("E5: UTF-16LE text runs in DOC are decoded") {
    // build a CFB whose FIB text range holds UTF-16LE (Word unicode docs)
    val text = "Unicode Grüße Тест\n"
    val bytes16 = text.replace("\n", "\r").getBytes("UTF-16LE")
    // CfbWriter writes cp1252; craft the stream manually instead
    val cp = graft.corpus.CfbWriter.write("x" * bytes16.length) // right-sized container
    // overwrite the text region (fcMin=2048) with UTF-16LE bytes and patch fcMac
    // locate WordDocument start: sector 0 data begins at offset 512
    System.arraycopy(bytes16, 0, cp, 512 + 2048, bytes16.length)
    // patch fcMac at FIB offset 28 (stream offset) = file offset 512+28
    val fcMac = 2048 + bytes16.length
    cp(512 + 28) = (fcMac & 0xff).toByte
    cp(512 + 29) = ((fcMac >> 8) & 0xff).toByte
    val out = Extract.extractBytes("doc", cp, Extract.Options())
    assert(out.content.contains("Unicode Grüße Тест"), out.content)
  }

  // ---------------------------------------------------------------- jpeg
  test("E6: JPEG dimensions + EXIF (spec/rika/parser_spec.rb:214-217)") {
    for (f <- Seq("image.jpg", "image_jpg_without_extension")) {
      val out = Extract.extractBytes("jpeg", fixture(f), Extract.Options())
      assert(out.contentType == "image/jpeg")
      assert(out.metadata("Image Height") == "72 pixels")
      assert(out.metadata("Image Width") == "72 pixels")
      assert(out.metadata("Software") == "Picasa")
      assert(out.content == "") // media: no textual content
      assert(out.isMedia)
    }
  }

  test("E6+: EXIF breadth — Orientation, DateTime(Original), GPS IFD") {
    import graft.corpus.{JpegWriterEx, PixelGen}
    val spec = JpegWriterEx.Spec(40, 30, seed = 5, gray = true, quality = 85,
      software = "graft-cam-7", orientation = 6,
      dateTime = "2023:06:14 09:41:00",
      gps = Some((48.858370, 2.294481))) // Eiffel Tower
    val bytes = JpegWriterEx.encode(spec,
      PixelGen.bytes(5, 40 * 30))
    val out = Extract.extractBytes("jpeg", bytes, Extract.Options())
    assert(out.metadata("Software") == "graft-cam-7")
    assert(out.metadata("Orientation") == "Right side, top (Rotate 90 CW)")
    assert(out.metadata("Date/Time") == "2023:06:14 09:41:00")
    assert(out.metadata("Date/Time Original") == "2023:06:14 09:41:00")
    assert(math.abs(out.metadata("GPS Latitude").toDouble - 48.858370) < 1e-4)
    assert(math.abs(out.metadata("GPS Longitude").toDouble - 2.294481) < 1e-4)
    // southern/western hemisphere signs
    val sw = JpegWriterEx.encode(spec.copy(gps = Some((-33.8568, -70.6483))),
      PixelGen.bytes(5, 40 * 30))
    val out2 = Extract.extractBytes("jpeg", sw, Extract.Options())
    assert(out2.metadata("GPS Latitude").toDouble < 0)
    assert(out2.metadata("GPS Longitude").toDouble < 0)
    // Software-only stays byte-compatible (legacy layout) and decodable
    val legacy = JpegWriterEx.encode(
      JpegWriterEx.Spec(24, 18, 6, gray = true, software = "Picasa"),
      PixelGen.bytes(6, 24 * 18))
    assert(Extract.extractBytes("jpeg", legacy, Extract.Options())
      .metadata("Software") == "Picasa")
    assert(JpegDecoder.decode(bytes).isDefined) // APP1 doesn't break decode
  }

  test("E11+: PNG ancillary chunks — tEXt, pHYs density, tIME") {
    import graft.corpus.PngWriterEx
    val bytes = PngWriterEx.write(PngWriterEx.Spec(20, 15, seed = 9,
      texts = Seq("Title" -> "Winter Lake", "Author" -> "graftgen"),
      dpi = 300, modified = "2024-11-05 14:30:59"))
    val out = Extract.extractBytes("png", bytes, Extract.Options())
    assert(out.metadata("png:Title") == "Winter Lake")
    assert(out.metadata("png:Author") == "graftgen")
    assert(out.metadata("X Resolution") == "300 dots per inch")
    assert(out.metadata("Y Resolution") == "300 dots per inch")
    assert(out.metadata("Last Modified") == "2024-11-05 14:30:59")
    // ancillary chunks before IDAT must not break pixel decode
    val img = graft.kernel.PngDecoder.decode(bytes).getOrElse(fail("decode"))
    assert(img.width == 20 && img.height == 15)
    assert(java.util.Arrays.equals(img.data, PngWriterEx.plane(
      PngWriterEx.Spec(20, 15, seed = 9))))
  }

  // ------------------------------------------------------------- unknown
  test("E9: XLSX text extraction (shared strings + inline numerics) + routing") {
    import graft.corpus.XlsxWriter
    val spec = XlsxWriter.Spec("Quarterly", "A. Author", Vector(
      Vector("name", "qty", "note"),
      Vector("widget", "42", "solid & <tested>"),
      Vector("gadget", "7", "fragile")))
    val bytes = XlsxWriter.write(spec)
    assert(Magic.sniff(bytes) == Magic.Kind.Xlsx)
    val out = Extract.extractBytes("xlsx", bytes, Extract.Options())
    assert(out.contentType ==
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
    assert(out.content == XlsxWriter.expectedText(spec))
    assert(out.content.contains("widget\t42\tsolid & <tested>"))
    assert(out.metadata("dc:title") == "Quarterly")
  }

  test("E10: PPTX slide text in numeric order + routing") {
    import graft.corpus.PptxWriter
    // 11 slides: lexicographic entry order (slide10 < slide2) must NOT
    // leak into the text order
    val spec = PptxWriter.Spec("Deck", "B. Author",
      Vector.tabulate(11)(i => Vector(s"Slide ${i + 1} headline", s"point ${i + 1}")))
    val bytes = PptxWriter.write(spec)
    assert(Magic.sniff(bytes) == Magic.Kind.Pptx)
    val out = Extract.extractBytes("pptx", bytes, Extract.Options())
    assert(out.contentType ==
      "application/vnd.openxmlformats-officedocument.presentationml.presentation")
    assert(out.content == PptxWriter.expectedText(spec))
    val idx = (1 to 11).map(i => out.content.indexOf(s"Slide $i headline"))
    assert(idx.forall(_ >= 0) && idx == idx.sorted, s"slide order wrong: $idx")
    assert(out.metadata("meta:slide-count") == "11")
  }

  test("E11: PNG dimensions; GIF dimensions (header kernels)") {
    import graft.corpus.PngWriter
    val bytes = PngWriter.write(PngWriter.Spec(123, 45, seed = 7L))
    assert(Magic.sniff(bytes) == Magic.Kind.Png)
    val out = Extract.extractBytes("png", bytes, Extract.Options())
    assert(out.contentType == "image/png")
    assert(out.isMedia)
    assert(out.metadata("Image Width") == "123 pixels")
    assert(out.metadata("Image Height") == "45 pixels")
    assert(out.metadata("Bits Per Sample") == "8")
    // GIF header-only contract
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x2c, 0x01, 0x0f, 0x00) ++ new Array[Byte](6) // 300 x 15
    assert(Magic.sniff(gif) == Magic.Kind.Gif)
    val g = Extract.extractBytes("gif", gif, Extract.Options())
    assert(g.contentType == "image/gif")
    assert(g.metadata("Image Width") == "300 pixels")
    assert(g.metadata("Image Height") == "15 pixels")
  }

  test("E12: RTF text + info metadata, skip destinations, escapes") {
    import graft.corpus.RtfWriter
    val spec = RtfWriter.Spec("Mémo — déjà", "A. Writer",
      Vector("First paragraph with braces {x} and back\\slash.",
        "Café naïve — em—dash", "Third."))
    val bytes = RtfWriter.write(spec)
    assert(Magic.sniff(bytes) == Magic.Kind.Rtf)
    val out = Extract.extractBytes("rtf", bytes, Extract.Options())
    assert(out.contentType == "application/rtf")
    assert(out.content == RtfWriter.expectedText(spec), s"got: ${out.content}")
    assert(out.metadata("dc:title") == "Mémo — déjà")
    assert(out.metadata("dc:creator") == "A. Writer")
    // font table / stylesheet names never leak into content
    assert(!out.content.contains("Times New Roman") && !out.content.contains("Normal"))
  }

  test("E13: ODT paragraphs + Dublin Core metadata") {
    import graft.corpus.OdtWriter
    val spec = OdtWriter.Spec("Das Dokument", "B. Autor",
      Vector("Erster Absatz.", "Zweiter Absatz & mehr.", "Dritter."))
    val bytes = OdtWriter.write(spec)
    assert(Magic.sniff(bytes) == Magic.Kind.Odt)
    val out = Extract.extractBytes("odt", bytes, Extract.Options())
    assert(out.contentType == "application/vnd.oasis.opendocument.text")
    assert(out.content == OdtWriter.expectedText(spec), s"got: ${out.content}")
    assert(out.metadata("dc:title") == "Das Dokument")
    assert(out.metadata("dc:creator") == "B. Autor")
  }

  test("E14: EPUB chapters in order + OPF metadata") {
    import graft.corpus.EpubWriter
    val spec = EpubWriter.Spec("The Book", "C. Author",
      Vector(Vector("Chapter one opens.", "It continues."),
        Vector("Chapter two arrives.")))
    val bytes = EpubWriter.write(spec)
    assert(Magic.sniff(bytes) == Magic.Kind.Epub)
    val out = Extract.extractBytes("epub", bytes, Extract.Options())
    assert(out.contentType == "application/epub+zip")
    assert(out.content == EpubWriter.expectedText(spec), s"got: ${out.content}")
    assert(out.metadata("dc:title") == "The Book")
    assert(out.metadata("dc:creator") == "C. Author")
    assert(out.content.indexOf("Chapter one") < out.content.indexOf("Chapter two"))
  }

  test("E15: TIFF dimensions + software via the shared IFD decoder") {
    import graft.corpus.TiffWriter
    val bytes = TiffWriter.write(TiffWriter.Spec(640, 480, "graft-scan"))
    assert(Magic.sniff(bytes) == Magic.Kind.Tiff)
    val out = Extract.extractBytes("tiff", bytes, Extract.Options())
    assert(out.contentType == "image/tiff")
    assert(out.isMedia)
    assert(out.metadata("Image Width") == "640 pixels")
    assert(out.metadata("Image Height") == "480 pixels")
    assert(out.metadata("Software") == "graft-scan")
  }

  test("E16: MP3 ID3v2 metadata") {
    import graft.corpus.Mp3Writer
    val bytes = Mp3Writer.write(Mp3Writer.Spec("Track Title", "The Artist", "An Album"))
    assert(Magic.sniff(bytes) == Magic.Kind.Mp3)
    val out = Extract.extractBytes("mp3", bytes, Extract.Options())
    assert(out.contentType == "audio/mpeg")
    assert(out.isMedia)
    assert(out.metadata("dc:title") == "Track Title")
    assert(out.metadata("xmpDM:artist") == "The Artist")
    assert(out.metadata("xmpDM:album") == "An Album")
  }

  test("E16++: MP3 VBR — Xing frame count gives the exact duration") {
    import graft.corpus.Mp3Writer
    val nFrames = 77
    val bytes = Mp3Writer.write(Mp3Writer.Spec("V", "A", "B", vbrFrames = nFrames))
    val out = Extract.extractBytes("mp3", bytes, Extract.Options())
    // exact: frames * 1152 samples / 44100 Hz — NOT the byte estimate
    // (the VBR stream's mixed bitrates would skew that badly)
    val expect = nFrames * 1152.0 / 44100
    assert(out.metadata("xmpDM:duration") == f"$expect%.3f")
    assert(out.metadata("xmpDM:audioChannelType") == "Stereo")
    assert(out.metadata("xmpDM:audioSampleRate") == "44100")
    // CBR stream (no Xing) still uses the byte estimate
    val cbr = Mp3Writer.write(Mp3Writer.Spec("T", "A", "B", nFrames = 20))
    val cout = Extract.extractBytes("mp3", cbr, Extract.Options())
    assert(cout.metadata("xmpDM:duration") == f"${20 * 104.0 * 8 / 32000}%.3f")
  }

  test("E16+++: bare MP3 (no ID3v2) sniffs by double frame sync; ID3v1 trailer read") {
    import graft.corpus.Mp3Writer
    // bare CBR stream with an ID3v1 trailer only
    val bytes = Mp3Writer.write(Mp3Writer.Spec("Old Song", "Tape Artist",
      "Garage Album", nFrames = 20, id3v2 = false, id3v1 = true))
    assert(Magic.sniff(bytes) == Magic.Kind.Mp3, "double-sync detection")
    val out = Extract.extractBytes("mp3", bytes, Extract.Options())
    assert(out.contentType == "audio/mpeg")
    assert(out.metadata("dc:title") == "Old Song")
    assert(out.metadata("xmpDM:artist") == "Tape Artist")
    assert(out.metadata("xmpDM:album") == "Garage Album")
    assert(out.metadata("xmpDM:releaseDate") == "1999")
    // duration excludes the 128-byte v1 trailer from the byte estimate
    assert(out.metadata("xmpDM:duration") == f"${20 * 104.0 * 8 / 32000}%.3f")
    // ID3v2 wins over v1 when both are present
    val both = Mp3Writer.write(Mp3Writer.Spec("New Title", "A", "B",
      nFrames = 8, id3v1 = true))
    assert(Extract.extractBytes("mp3", both, Extract.Options())
      .metadata("dc:title") == "New Title")
    // bare stream with no tags at all: still audio/mpeg with duration
    val bare = Mp3Writer.write(Mp3Writer.Spec("X", "Y", "Z",
      nFrames = 12, id3v2 = false))
    assert(Magic.sniff(bare) == Magic.Kind.Mp3)
    val bout = Extract.extractBytes("mp3", bare, Extract.Options())
    assert(bout.metadata("xmpDM:audioSampleRate") == "44100")
    assert(bout.metadata("xmpDM:audioCompressor") == "MP3")
    // bare + VBR: the Xing first frame must be EXACTLY its declared
    // size or the double-sync check fails (caught by the 100k sweep:
    // a 4-byte Xing-length slip made every bare VBR stream unsniffable)
    val bareVbr = Mp3Writer.write(Mp3Writer.Spec("W", "A", "B",
      vbrFrames = 33, id3v2 = false, id3v1 = true))
    assert(Magic.sniff(bareVbr) == Magic.Kind.Mp3, "bare VBR double-sync")
    val vout = Extract.extractBytes("mp3", bareVbr, Extract.Options())
    assert(vout.metadata("xmpDM:duration") == f"${33 * 1152.0 / 44100}%.3f")
    // a lone 0xFFFB in random bytes must NOT sniff as mp3 (single sync)
    val noise = Array[Byte](0xff.toByte, 0xfb.toByte, 0x10, 0x00) ++
      Array.fill[Byte](200)(0x41)
    assert(Magic.sniff(noise) != Magic.Kind.Mp3)
  }

  test("E16+: MP3 frame-header duration (CBR estimate matches frame count)") {
    import graft.corpus.Mp3Writer
    val nFrames = 20
    val bytes = Mp3Writer.write(Mp3Writer.Spec("T", "A", "B", nFrames = nFrames))
    val out = Extract.extractBytes("mp3", bytes, Extract.Options())
    assert(out.metadata("xmpDM:audioSampleRate") == "44100")
    assert(out.metadata("version") == "MPEG 3 Layer 3 version 1.0")
    // 104-byte frames at 32 kbps: duration = nFrames*104*8/32000
    val expect = nFrames * 104.0 * 8 / 32000
    val got = out.metadata("xmpDM:duration").toDouble
    assert(math.abs(got - expect) < 0.005, s"got $got expect $expect")
  }

  test("E34: MKV unknown-size child crossing the parent limit degrades, never throws (ADVICE r6)") {
    // EBML header (DocType "webm") + Segment(size 8) containing
    // Info(size 2) whose body is just a Title element id (0x7BA9); the
    // title's size vint is read PAST Info's limit and is 0xFF (unknown
    // size), so body > limit and the child length is limit-body = -1 —
    // the unclamped str() threw StringIndexOutOfBoundsException past
    // the AIOOBE-only catch
    val bytes = Array[Int](
      0x1A, 0x45, 0xDF, 0xA3, 0x87,             // EBML header, size 7
      0x42, 0x82, 0x84, 'w', 'e', 'b', 'm',     // DocType "webm"
      0x18, 0x53, 0x80, 0x67, 0x88,             // Segment, size 8
      0x15, 0x49, 0xA9, 0x66, 0x82,             // Info, size 2
      0x7B, 0xA9,                               // Title id (body ends here)
      0xFF                                      // read as the title's UNKNOWN size vint
    ).map(_.toByte)
    val (ct, meta) = graft.kernel.MkvKernel.extract(bytes, matroska = false)
    assert(ct.nonEmpty) // typed row, not an escaped exception
    // full dispatch also stays a typed media row
    val out = Extract.extractBytes("clip.webm", bytes, Extract.Options())
    assert(out.contentType.contains("webm") || out.contentType.contains("matroska"),
      out.contentType)
  }

  test("E34: Matroska/WebM — EBML DocType routing, Info + track metadata") {
    import graft.corpus.MkvWriter
    // webm, video+audio, default timestamp scale
    val wm = MkvWriter.Spec(webm = true, title = "Clip Title", durationMs = 12345.0,
      video = Some((640, 360, "V_VP9")), audio = Some((48000.0, 2, "A_OPUS")))
    val wmBytes = MkvWriter.write(wm)
    assert(Magic.sniff(wmBytes) == Magic.Kind.Webm)
    val out = Extract.extractBytes("webm", wmBytes, Extract.Options())
    assert(out.contentType == "video/webm" && out.isMedia)
    MkvWriter.expectedMeta(wm).foreach { case (k, v) =>
      assert(out.metadata.get(k).contains(v), s"webm $k")
    }
    assert(out.metadata("xmpDM:duration") == "12.345")

    // matroska, audio-only -> audio/x-matroska; non-default scale;
    // 4-byte floats; unknown-size segment (streamed shape)
    val mk = MkvWriter.Spec(webm = false, durationMs = 900.0,
      timestampScale = 2000000L, audio = Some((44100.0, 1, "A_AAC")),
      unknownSegmentSize = true, floatWidth = 4)
    val mkBytes = MkvWriter.write(mk)
    assert(Magic.sniff(mkBytes) == Magic.Kind.Mkv)
    val out2 = Extract.extractBytes("mkv", mkBytes, Extract.Options())
    assert(out2.contentType == "audio/x-matroska" && out2.isMedia)
    MkvWriter.expectedMeta(mk).foreach { case (k, v) =>
      assert(out2.metadata.get(k).contains(v), s"mkv $k")
    }
    assert(out2.metadata("xmpDM:duration") == "1.800") // 900 units x 2 ms
    assert(!out2.metadata.contains("Image Width"))

    // video-only matroska stays video/x-matroska
    val mv = MkvWriter.Spec(webm = false, video = Some((1920, 1080, "V_MPEG4/ISO/AVC")))
    val out3 = Extract.extractBytes("mkv", MkvWriter.write(mv), Extract.Options())
    assert(out3.contentType == "video/x-matroska")
    assert(out3.metadata("Image Width") == "1920 pixels")

    // DateUTC + Tags: created timestamp; Tags fill holes, Info wins
    val tagged = MkvWriter.Spec(webm = true, title = "Info Wins",
      dateUtcMs = 1595520399000L,
      tags = Vector("TITLE" -> "Tag Title", "ARTIST" -> "Tag Artist"),
      audio = Some((48000.0, 2, "A_OPUS")))
    val out4 = Extract.extractBytes("webm", MkvWriter.write(tagged), Extract.Options())
    MkvWriter.expectedMeta(tagged).foreach { case (k, v) =>
      assert(out4.metadata.get(k).contains(v), s"tagged $k")
    }
    assert(out4.metadata("dc:title") == "Info Wins") // Info beats Tags
    assert(out4.metadata("xmpDM:artist") == "Tag Artist")
    assert(out4.metadata("dcterms:created") == "2020-07-23T16:06:39Z")

    // malformed: truncations and junk never throw
    val rnd = new java.util.Random(11L)
    for (cut <- 0 until wmBytes.length by 13)
      Extract.extractBytes("webm", java.util.Arrays.copyOf(wmBytes, cut), Extract.Options())
    for (_ <- 0 until 100) {
      val b = new Array[Byte](4 + rnd.nextInt(64))
      rnd.nextBytes(b)
      b(0) = 0x1a.toByte; b(1) = 0x45.toByte; b(2) = 0xdf.toByte; b(3) = 0xa3.toByte
      Extract.extractBytes("mkv", b, Extract.Options())
    }
  }

  test("E35: detection-only magics — sqlite/woff/woff2/wasm/elf/class/exe typed opaque") {
    val rnd = new java.util.Random(3L)
    def junk(n: Int): Array[Byte] = { val b = new Array[Byte](n); rnd.nextBytes(b); b }
    val cases = Seq(
      ("SQLite format 3".getBytes("US-ASCII") :+ 0.toByte) -> "application/x-sqlite3",
      "wOFF".getBytes("US-ASCII") -> "font/woff",
      "wOF2".getBytes("US-ASCII") -> "font/woff2",
      Array[Byte](0, 'a', 's', 'm', 1, 0, 0, 0) -> "application/wasm",
      Array[Byte](0x7f, 'E', 'L', 'F', 2, 1, 1) -> "application/x-elf",
      Array[Byte](0xca.toByte, 0xfe.toByte, 0xba.toByte, 0xbe.toByte, 0, 0, 0, 0x34) ->
        "application/java-vm",
      Array[Byte]('M', 'Z', 0x90.toByte, 0) -> "application/x-msdownload")
    for ((magic, ct) <- cases) {
      val out = Extract.extractBytes("bin", magic ++ junk(128), Extract.Options())
      assert(out.contentType == ct, ct)
      assert(out.content.isEmpty && out.issue.isEmpty && !out.isMedia, ct)
    }
    // MZ yields to the text fallback: an ASCII file starting "MZ" is text
    val mzText = Extract.extractBytes("txt",
      ("MZ and more plain words. " * 8).getBytes("US-ASCII"), Extract.Options())
    assert(mzText.contentType.startsWith("text/plain"))
  }

  test("E29: ICO / PSD / MIDI header metadata") {
    import graft.corpus.MiscMediaWriters
    val ico = MiscMediaWriters.writeIco(Seq((16, 16), (256, 256), (48, 48)))
    assert(Magic.sniff(ico) == Magic.Kind.Ico)
    val io = Extract.extractBytes("ico", ico, Extract.Options())
    assert(io.contentType == "image/vnd.microsoft.icon" && io.isMedia)
    assert(io.metadata("Image Width") == "256 pixels")
    assert(io.metadata("Image Count") == "3")
    val psd = MiscMediaWriters.writePsd(640, 480, 3, 3)
    assert(Magic.sniff(psd) == Magic.Kind.Psd)
    val po = Extract.extractBytes("psd", psd, Extract.Options())
    assert(po.contentType == "image/vnd.adobe.photoshop" && po.isMedia)
    assert(po.metadata("Image Width") == "640 pixels")
    assert(po.metadata("Color Mode") == "RGB")
    val mid = MiscMediaWriters.writeMidi(1, 4, 480)
    assert(Magic.sniff(mid) == Magic.Kind.Midi)
    val mo = Extract.extractBytes("midi", mid, Extract.Options())
    assert(mo.contentType == "audio/midi" && mo.isMedia)
    assert(mo.metadata("midi:format") == "1")
    assert(mo.metadata("midi:tracks") == "4")
    assert(mo.metadata("midi:division") == "480")
    // ICO's weak magic must not swallow leading-zero binary noise
    val zeros = new Array[Byte](64)
    assert(Magic.sniff(zeros) != Magic.Kind.Ico)
  }

  test("E28: Ogg Vorbis/Opus identification-header metadata") {
    import graft.corpus.OggWriter
    for (opus <- Seq(false, true)) {
      val bytes = OggWriter.write(OggWriter.Spec(48000, 2, opus = opus))
      assert(Magic.sniff(bytes) == Magic.Kind.Ogg)
      val out = Extract.extractBytes("ogg", bytes, Extract.Options())
      assert(out.contentType == "application/ogg")
      assert(out.isMedia, s"opus=$opus")
      assert(out.metadata("xmpDM:audioSampleRate") == "48000")
      assert(out.metadata("channels") == "2")
      assert(out.metadata("xmpDM:audioCompressor") == (if (opus) "Opus" else "Vorbis"))
    }
    // headerless Ogg magic (exoticPiece shape) stays a typed opaque row
    val junk = "OggS0000".getBytes("US-ASCII") ++ Array.fill[Byte](64)(3)
    val out2 = Extract.extractBytes("ogg", junk, Extract.Options())
    assert(!out2.isMedia && out2.contentType == "application/ogg" && out2.metadata.isEmpty)
  }

  test("E28+: Ogg duration from the EOS page's granule position") {
    import graft.corpus.OggWriter
    // Vorbis: granule counts at the stream's sample rate
    val v = Extract.extractBytes("ogg", OggWriter.write(
      OggWriter.Spec(44100, 2, nSamples = 132300L)), Extract.Options())
    assert(v.metadata("xmpDM:duration") == "3.000")
    // Opus: granules are ALWAYS 48 kHz regardless of input rate
    val o = Extract.extractBytes("ogg", OggWriter.write(
      OggWriter.Spec(16000, 1, opus = true, nSamples = 96000L)), Extract.Options())
    assert(o.metadata("xmpDM:duration") == "2.000")
    // no EOS page (legacy writer shape): no duration key, rest unchanged
    val n = Extract.extractBytes("ogg", OggWriter.write(
      OggWriter.Spec(48000, 2)), Extract.Options())
    assert(!n.metadata.contains("xmpDM:duration"))
    assert(n.metadata("xmpDM:audioSampleRate") == "48000")
  }

  test("E27+: FLAC VORBIS_COMMENT tags (title/artist/album)") {
    import graft.corpus.FlacWriter
    val bytes = FlacWriter.write(FlacWriter.Spec(44100, 2, 441000L,
      title = "Winter Lake", artist = "The Graft Ensemble", album = "Corpus"))
    val out = Extract.extractBytes("flac", bytes, Extract.Options())
    assert(out.metadata("dc:title") == "Winter Lake")
    assert(out.metadata("xmpDM:artist") == "The Graft Ensemble")
    assert(out.metadata("xmpDM:album") == "Corpus")
    assert(out.metadata("xmpDM:duration") == "10.000") // STREAMINFO intact
    // legacy single-block shape unchanged: no tag keys
    val legacy = Extract.extractBytes("flac",
      FlacWriter.write(FlacWriter.Spec(44100, 2, 441000L)), Extract.Options())
    assert(!legacy.metadata.contains("dc:title"))
    assert(legacy.metadata("xmpDM:duration") == "10.000")
  }

  test("E27: FLAC STREAMINFO metadata (exact duration)") {
    import graft.corpus.FlacWriter
    val bytes = FlacWriter.write(FlacWriter.Spec(48000, 2, nSamples = 96000))
    assert(Magic.sniff(bytes) == Magic.Kind.Flac)
    val out = Extract.extractBytes("flac", bytes, Extract.Options())
    assert(out.contentType == "audio/flac")
    assert(out.isMedia)
    assert(out.metadata("xmpDM:audioSampleRate") == "48000")
    assert(out.metadata("channels") == "2")
    assert(out.metadata("bits") == "16")
    assert(out.metadata("xmpDM:duration") == "2.000")
    // magic-only FLAC (exoticPiece shape) stays a typed opaque row
    val junk = "fLaC0000".getBytes("US-ASCII") ++ Array.fill[Byte](64)(7)
    val out2 = Extract.extractBytes("flac", junk, Extract.Options())
    assert(!out2.isMedia && out2.contentType == "audio/flac" && out2.metadata.isEmpty)
  }

  test("E17: plain zip (non-OOXML) routes to the archive kernel, members extracted in entry order") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    zos.putNextEntry(new java.util.zip.ZipEntry("some/file.txt"))
    zos.write("hello archive member one".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("other/second.txt"))
    zos.write("second member text".getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    assert(Magic.sniff(bos.toByteArray) == Magic.Kind.Zip)
    val out = Extract.extractBytes("zip", bos.toByteArray, Extract.Options())
    assert(out.contentType == "application/zip")
    assert(out.content == "hello archive member one\n\nsecond member text")
    assert(out.metadata("archive:entry-count") == "2")
    assert(out.metadata("archive:entry-names") == "some/file.txt,other/second.txt")
  }

  test("E17: one nested archive level extracts; depth 2 degrades to opaque, never recurses") {
    import graft.corpus.ArchiveWriter
    // zip-in-zip: the nested member's text IS extracted (depth 2 reach)
    val inner = ArchiveWriter.writeZip(Seq(
      "deep.txt" -> "one level down".getBytes("UTF-8")))
    val outer = ArchiveWriter.writeZip(Seq(
      "visible.txt" -> "outer text".getBytes("UTF-8"),
      "nested.zip" -> inner))
    val out = Extract.extractBytes("zip", outer, Extract.Options())
    assert(out.content == "outer text\n\none level down")
    assert(out.metadata("archive:entry-count") == "2")
    // tar-in-zip works the same way
    val tarInZip = ArchiveWriter.writeZip(Seq(
      "t.tar" -> ArchiveWriter.writeTar(Seq(
        "inner.txt" -> "tar member below".getBytes("UTF-8")))))
    assert(Extract.extractBytes("zip", tarInZip,
      Extract.Options()).content == "tar member below")
    // zip-in-zip-in-zip: the third level is opaque (depth bound = 2)
    val doubly = ArchiveWriter.writeZip(Seq(
      "top.txt" -> "top text".getBytes("UTF-8"),
      "mid.zip" -> ArchiveWriter.writeZip(Seq(
        "mid.txt" -> "mid text".getBytes("UTF-8"),
        "deep.zip" -> inner))))
    val out3 = Extract.extractBytes("zip", doubly, Extract.Options())
    assert(out3.content == "top text\n\nmid text") // level-3 invisible
  }

  test("E18: tar.gz opens through the gzip wrapper (gzip costs no depth level)") {
    import graft.corpus.ArchiveWriter
    val bytes = ArchiveWriter.writeTarGz(Seq(
      "a.txt" -> "first tar member".getBytes("UTF-8"),
      "b/c.txt" -> "second tar member".getBytes("UTF-8")))
    assert(Magic.sniff(bytes) == Magic.Kind.Gzip)
    val out = Extract.extractBytes("tgz", bytes, Extract.Options())
    assert(out.contentType == "application/gzip")
    assert(out.content == "first tar member\n\nsecond tar member")
  }

  test("E18+: bz2/xz/zstd wrappers open like gzip (platform codec jars)") {
    import graft.corpus.ArchiveWriter
    val tar = ArchiveWriter.writeTar(Seq(
      "a.txt" -> "wrapped member one".getBytes("UTF-8"),
      "b.txt" -> "wrapped member two".getBytes("UTF-8")))
    for ((codec, kind, ct) <- Seq(
        ("bz2", Magic.Kind.Bz2, "application/x-bzip2"),
        ("xz", Magic.Kind.Xz, "application/x-xz"),
        ("zst", Magic.Kind.Zstd, "application/zstd"))) {
      val bytes = ArchiveWriter.writeWrapped(tar, codec)
      assert(Magic.sniff(bytes) == kind, codec)
      val out = Extract.extractBytes("wrapped", bytes, Extract.Options())
      assert(out.contentType == ct, codec)
      assert(out.content == "wrapped member one\n\nwrapped member two", codec)
    }
  }

  test("E18+: MIXED wrapper nests unwrap iteratively, bounded at 2") {
    import graft.corpus.ArchiveWriter
    val txt = "nested text payload for the wrapper bound".getBytes("UTF-8")
    // bz2(gz(text)): two layers, opens
    val two = ArchiveWriter.writeWrapped(ArchiveWriter.writeWrapped(txt, "gz"), "bz2")
    val out2 = Extract.extractBytes("w", two, Extract.Options())
    assert(out2.content.startsWith("nested text payload"))
    assert(out2.contentType == "application/x-bzip2") // outermost wrapper names the type
    // zst(bz2(gz(text))): three layers exceeds the bound -> typed opaque
    val three = ArchiveWriter.writeWrapped(two, "zst")
    val out3 = Extract.extractBytes("w", three, Extract.Options())
    assert(out3.content == "" && out3.contentType == "application/zstd")
    assert(out3.issue.isEmpty) // bounded, not an error
  }

  test("D1: detection-only exotic magics -> correctly typed opaque rows") {
    val cases = Seq(
      (Array[Byte]('7', 'z', 0xbc.toByte, 0xaf.toByte, 0x27, 0x1c, 0, 4),
        Magic.Kind.SevenZ, "application/x-7z-compressed"),
      (Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x00, 1), Magic.Kind.Rar,
        "application/x-rar-compressed"),
      ("fLaC0000".getBytes("US-ASCII"), Magic.Kind.Flac, "audio/flac"),
      ("OggS0000".getBytes("US-ASCII"), Magic.Kind.Ogg, "application/ogg"))
    for ((bytes, kind, ct) <- cases) {
      assert(Magic.sniff(bytes) == kind)
      val out = Extract.extractBytes("x", bytes, Extract.Options())
      assert(out.contentType == ct && out.content == "" && out.issue.isEmpty)
    }
  }

  test("E18: bare tar routes directly") {
    import graft.corpus.ArchiveWriter
    val bytes = ArchiveWriter.writeTar(Seq("x.txt" -> "tar body".getBytes("UTF-8")))
    assert(Magic.sniff(bytes) == Magic.Kind.Tar)
    val out = Extract.extractBytes("tar", bytes, Extract.Options())
    assert(out.contentType == "application/x-tar")
    assert(out.content == "tar body")
  }

  test("E19: .eml headers -> metadata, 8bit body (both byte and string paths)") {
    import graft.corpus.EmlWriter
    val spec = EmlWriter.Spec("Quarterly Report", "alice@example.org",
      "docs@example.org", Vector("First paragraph of the mail.",
        "Second paragraph follows."), mode = 0)
    val bytes = EmlWriter.write(spec)
    assert(Magic.sniff(bytes) == Magic.Kind.Eml)
    val out = Extract.extractBytes("eml", bytes, Extract.Options())
    assert(out.contentType == "message/rfc822")
    assert(out.metadata("dc:title") == "Quarterly Report")
    assert(out.metadata("dc:creator") == "alice@example.org")
    assert(out.metadata("Message-To") == "docs@example.org")
    assert(out.content == EmlWriter.expectedText(spec))
    // inline string path (extractText)
    val inline = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val out2 = Extract.extractText("txt", inline, Extract.Options())
    assert(out2.contentType == "message/rfc822")
    assert(out2.content == EmlWriter.expectedText(spec))
  }

  test("E19: .eml base64 / quoted-printable / multipart bodies decode") {
    import graft.corpus.EmlWriter
    for (mode <- 1 to 3) {
      val spec = EmlWriter.Spec("Sübjéct läng", "bob@example.org", "x@example.org",
        Vector("Björn käufte zwölf Äpfel.", "Ésta línea está en español."), mode)
      val out = Extract.extractBytes("eml", EmlWriter.write(spec), Extract.Options())
      assert(out.content == EmlWriter.expectedText(spec), s"mode $mode")
    }
  }

  test("E12/E13: RTF and ODT carry word/page count metadata") {
    import graft.corpus.{OdtWriter, RtfWriter}
    val rtf = Extract.extractBytes("rtf", RtfWriter.write(RtfWriter.Spec(
      "T", "A", Vector("one two three", "four five"))), Extract.Options())
    assert(rtf.metadata("meta:word-count") == "5")
    assert(rtf.metadata("meta:page-count") == "1")
    val odt = Extract.extractBytes("odt", OdtWriter.write(OdtWriter.Spec(
      "T", "A", Vector("alpha beta", "gamma"))), Extract.Options())
    assert(odt.metadata("meta:word-count") == "3")
    assert(odt.metadata("meta:page-count") == "1")
  }

  test("E20: Outlook .msg — MAPI property streams over the shared CFB walker") {
    import graft.corpus.MsgWriter
    val spec = MsgWriter.Spec("Budget Review", "carol@example.org",
      "team@example.org", Vector("First body paragraph.", "Second body paragraph."))
    val bytes = MsgWriter.write(spec)
    assert(Magic.sniff(bytes) == Magic.Kind.Doc) // CFB magic routes to the dispatch
    val out = Extract.extractBytes("msg", bytes, Extract.Options())
    assert(out.contentType == "application/vnd.ms-outlook")
    assert(out.metadata("dc:title") == "Budget Review")
    assert(out.metadata("dc:creator") == "carol@example.org")
    assert(out.metadata("Message-To") == "team@example.org")
    assert(out.content == MsgWriter.expectedText(spec))
    // a CFB that is neither Word nor Outlook stays the generic OLE2 type
    val generic = graft.corpus.CfbWriter.buildStreams(Seq(
      "SomeStream" -> "data".getBytes("UTF-8")))
    val g = Extract.extractBytes("doc", generic, Extract.Options())
    assert(g.contentType == "application/x-tika-msoffice")
    assert(g.content == "")
    // attachment sub-storages: names via PR_ATTACH_LONG_FILENAME; the
    // body and top-level metadata stay untouched, and attachment-scope
    // streams never shadow root-level ones (the 0037 decoy)
    val att = MsgWriter.Spec("With Files", "dave@example.org", "docs@example.org",
      Vector("Body paragraph here."),
      attachments = Seq(
        "budget.xlsx" -> Array.tabulate[Byte](700)(i => (i * 3).toByte),
        "notes.txt" -> "plain attachment bytes".getBytes("UTF-8")))
    val aout = Extract.extractBytes("msg", MsgWriter.write(att), Extract.Options())
    assert(aout.metadata("Message-Attachment-Count") == "2")
    assert(aout.metadata("Message-Attachment-Names") == "budget.xlsx,notes.txt")
    assert(aout.metadata("dc:title") == "With Files")
    assert(aout.content == MsgWriter.expectedText(att))
    // no-attachment messages carry no attachment keys
    assert(!out.metadata.contains("Message-Attachment-Count"))
  }

  test("E21: .xls BIFF8 — SST (incl. mid-string Continue split), LABELSST/NUMBER cells, SI metadata") {
    import graft.corpus.XlsBinWriter
    for (split <- Seq(false, true)) {
      val spec = XlsBinWriter.Spec("Sheet Title", "An Author",
        Vector(
          Vector(Vector("alpha one", "42"), Vector("béta wide", "7")),
          Vector(Vector("second sheet cell", "123456"))),
        splitSst = split)
      val out = Extract.extractBytes("xls", XlsBinWriter.write(spec), Extract.Options())
      assert(out.contentType == "application/vnd.ms-excel", s"split=$split")
      assert(out.content == XlsBinWriter.expectedText(spec), s"split=$split")
      assert(out.metadata("dc:title") == "Sheet Title")
      assert(out.metadata("dc:creator") == "An Author")
    }
  }

  test("E22: .ppt — container-record walk, TextBytes + TextChars atoms") {
    import graft.corpus.PptBinWriter
    val spec = PptBinWriter.Spec(Vector(
      Vector("ascii title line", "second paragraph"),
      Vector("ünïcode slide text")))
    val out = Extract.extractBytes("ppt", PptBinWriter.write(spec), Extract.Options())
    assert(out.contentType == "application/vnd.ms-powerpoint")
    assert(out.content == PptBinWriter.expectedText(spec))
  }

  test("CFB directory scoping: a nested storage's streams do not shadow top level") {
    import graft.corpus.CfbWriter
    // top level: one __substg subject + a storage whose CHILD is a
    // WordDocument stream. Scoped lookup must classify as Outlook (the
    // nested WordDocument is invisible); a flat scan would see it and
    // misroute to msword.
    val subject = "Scoped Subject".getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    val bytes = CfbWriter.buildStreams(Seq(
      "__substg1.0_0037001F" -> subject,
      "Recip" -> "x".getBytes("UTF-8"),
      "WordDocument" -> new Array[Byte](64)))
    // patch entry 2 ("Recip", dir index 2) into a STORAGE with child = 3
    def u32at(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    val dirOff = 512 + u32at(48).toInt * 512
    val e2 = dirOff + 2 * 128
    bytes(e2 + 66) = 1 // type: storage
    // right sibling: none; child: entry 3
    for (k <- 0 until 4) bytes(e2 + 72 + k) = 0xff.toByte
    bytes(e2 + 76) = 3; bytes(e2 + 77) = 0; bytes(e2 + 78) = 0; bytes(e2 + 79) = 0
    val out = Extract.extractBytes("doc", bytes, Extract.Options())
    assert(out.contentType == "application/vnd.ms-outlook", out.contentType)
    assert(out.metadata("dc:title") == "Scoped Subject")
  }

  test("E23: WAV/BMP/WebP/MP4 container metadata (typed-metadata multimodal contract)") {
    import graft.corpus.{BmpWriter, Mp4Writer, WavWriter, WebpWriter}
    val wav = Extract.extractBytes("wav",
      WavWriter.write(WavWriter.Spec(16000, 2, 2500)), Extract.Options())
    assert(wav.contentType == "audio/vnd.wave" && wav.isMedia)
    assert(wav.metadata("xmpDM:audioSampleRate") == "16000")
    assert(wav.metadata("channels") == "2")
    assert(wav.metadata("xmpDM:duration") == "2.500")

    val bmp = Extract.extractBytes("bmp",
      BmpWriter.write(BmpWriter.Spec(320, 200)), Extract.Options())
    assert(bmp.contentType == "image/bmp" && bmp.isMedia)
    assert(bmp.metadata("Image Width") == "320 pixels")
    assert(bmp.metadata("Image Height") == "200 pixels")

    val webp = Extract.extractBytes("webp",
      WebpWriter.write(WebpWriter.Spec(1024, 777)), Extract.Options())
    assert(webp.contentType == "image/webp" && webp.isMedia)
    assert(webp.metadata("Image Width") == "1024 pixels")
    assert(webp.metadata("Image Height") == "777 pixels")

    val mp4 = Extract.extractBytes("mp4",
      Mp4Writer.write(Mp4Writer.Spec("isom", 1000, 125500L, 640, 360)), Extract.Options())
    assert(mp4.contentType == "video/mp4" && mp4.isMedia)
    assert(mp4.metadata("major_brand") == "isom")
    assert(mp4.metadata("xmpDM:duration") == "125.500")
    assert(mp4.metadata("Image Width") == "640 pixels")
    assert(mp4.metadata("Image Height") == "360 pixels")
  }

  test("E23++: MP4 ilst tags (udta/meta) map onto dc:/xmpDM: keys; stco offsets survive") {
    import graft.corpus.Mp4Writer
    import graft.kernel.Mp4Kernel
    val tags = Vector("©nam" -> "Clip Title", "©ART" -> "Artist Ñame",
      "©alb" -> "The Album", "©day" -> "1997", "©gen" -> "jazz")
    // legacy metadata-only shape
    val lite = Extract.extractBytes("mp4", Mp4Writer.write(
      Mp4Writer.Spec("isom", 1000, 2500L, 320, 240, tags = tags)), Extract.Options())
    assert(lite.metadata("dc:title") == "Clip Title")
    assert(lite.metadata("xmpDM:artist") == "Artist Ñame") // UTF-8 value
    assert(lite.metadata("xmpDM:album") == "The Album")
    assert(lite.metadata("xmpDM:releaseDate") == "1997")
    assert(lite.metadata("xmpDM:genre") == "jazz")
    assert(lite.metadata("xmpDM:duration") == "2.500") // mvhd unaffected
    // full sample-table shape: udta enlarges moov; chunk offsets must
    // still point at the true sample bytes (two-phase sizing)
    val deltas = Vector(100, 100, 100, 100)
    val full = Mp4Writer.write(Mp4Writer.Spec("isom", 1000, 400L, 320, 240,
      mediaTimescale = 1000, sampleDeltas = deltas,
      sampleSizes = Vector(64, 64, 64, 64), samplesPerChunk = Vector(2, 2),
      tags = tags))
    assert(Extract.extractBytes("mp4", full, Extract.Options())
      .metadata("dc:title") == "Clip Title")
    val st = Mp4Kernel.sampleTable(full).get
    assert(st.length == 4 && st.forall(_.size == 64))
    // untagged file: keys absent
    val plain = Extract.extractBytes("mp4", Mp4Writer.write(
      Mp4Writer.Spec("isom", 1000, 2500L, 320, 240)), Extract.Options())
    assert(plain.metadata.get("dc:title").isEmpty)
  }

  test("E23+: MP4 sample tables (stts/stsc/stsz/stco/stss) round-trip exactly") {
    import graft.corpus.Mp4Writer
    import graft.kernel.Mp4Kernel
    // non-uniform deltas (VFR), ragged chunks, keyframes every 5
    val deltas = Vector(100, 100, 100, 150, 100, 100, 200, 100, 100, 100, 50, 100)
    val sizes = Vector(500, 210, 220, 230, 480, 250, 260, 270, 490, 290, 300, 310)
    val chunks = Vector(3, 5, 2, 2)
    val keys = Vector(1, 5, 9)
    val bytes = Mp4Writer.write(Mp4Writer.Spec("isom", 1000, 1500L, 320, 240,
      mediaTimescale = 3000, sampleDeltas = deltas, sampleSizes = sizes,
      samplesPerChunk = chunks, keyframes = keys))
    val st = Mp4Kernel.sampleTable(bytes).get
    assert(st.length == 12)
    // timestamps = cumulative deltas scaled by mdhd timescale
    val expTs = deltas.scanLeft(0L)(_ + _).init.map(_ * 1000 / 3000)
    assert(st.map(_.tsMs).toSeq == expTs)
    assert(st.map(_.size).toSeq == sizes)
    assert(st.map(_.keyframe).toSeq ==
      (1 to 12).map(i => keys.contains(i)))
    // offsets land inside mdat, are strictly increasing, and contiguous
    // within a chunk; chunk starts match stco (verified via parse)
    val offs = st.map(_.offset)
    assert(offs.zip(offs.tail).forall { case (a, b) => b > a })
    // per-sample bytes really live at the parsed offsets: checksum over
    // [offset, offset+size) stays inside the file for every sample
    assert(st.forall(s => s.offset + s.size <= bytes.length))
    // chunk boundaries: samples 0-2 chunk 1, 3-7 chunk 2, contiguity
    assert(offs(1) == offs(0) + sizes(0) && offs(2) == offs(1) + sizes(1))
    assert(offs(4) == offs(3) + sizes(3))
    // no stss box -> every sample is a sync sample
    val allSync = Mp4Writer.write(Mp4Writer.Spec("isom", 1000, 400L, 64, 64,
      mediaTimescale = 1000, sampleDeltas = Vector(100, 100, 100, 100),
      sampleSizes = Vector(50, 60, 70, 80), samplesPerChunk = Vector(4)))
    assert(Mp4Kernel.sampleTable(allSync).get.forall(_.keyframe))
    // legacy metadata-only shape (no stbl) -> None, never throws
    assert(Mp4Kernel.sampleTable(
      Mp4Writer.write(Mp4Writer.Spec("isom", 1000, 1000L, 64, 64))).isEmpty)
    // malformed: truncated + garbage stay None
    assert(Mp4Kernel.sampleTable(bytes.take(40)).isEmpty)
    assert(Mp4Kernel.sampleTable(Array.fill(64)(0x7f.toByte)).isEmpty)
    // mvhd metadata still real on the sample-table shape
    val meta = Mp4Kernel.extract(bytes)
    assert(meta("xmpDM:duration") == "1.500")
  }

  test("E30: HEIC/AVIF — brand routing + ispe dimensions (iPhone/AV1 stills)") {
    import graft.corpus.HeifWriter
    val heic = HeifWriter.write(HeifWriter.Spec("heic", 4032, 3024))
    assert(Magic.sniff(heic) == Magic.Kind.Heic)
    val out = Extract.extractBytes("heic", heic, Extract.Options())
    assert(out.contentType == "image/heic" && out.isMedia)
    assert(out.metadata("major_brand") == "heic")
    assert(out.metadata("Image Width") == "4032 pixels")
    assert(out.metadata("Image Height") == "3024 pixels")
    val avif = HeifWriter.write(HeifWriter.Spec("avif", 1280, 720))
    assert(Magic.sniff(avif) == Magic.Kind.Avif)
    val aout = Extract.extractBytes("avif", avif, Extract.Options())
    assert(aout.contentType == "image/avif")
    assert(aout.metadata("Image Width") == "1280 pixels")
    // mif1/msf1 are generic HEIF brands -> image/heif (Tika parity);
    // plain mp4 brands do NOT route to the still-image kinds
    val mif = HeifWriter.write(HeifWriter.Spec("mif1", 8, 8))
    assert(Magic.sniff(mif) == Magic.Kind.Heif)
    assert(Extract.extractBytes("m.heif", mif,
      Extract.Options()).contentType == "image/heif")
    import graft.corpus.Mp4Writer
    assert(Magic.sniff(Mp4Writer.write(
      Mp4Writer.Spec("isom", 1000, 1000L, 64, 64))) == Magic.Kind.Mp4)
    // truncated/garbage never throws
    Extract.extractBytes("heic", heic.take(20), Extract.Options())
    Extract.extractBytes("heic", Array.fill(64)(0x7f.toByte), Extract.Options())
  }

  test("E12+: RTF tables — \\cell/\\row become tab-joined row lines") {
    import graft.corpus.RtfWriter
    val spec = RtfWriter.Spec("Tabled", "A",
      Vector("intro paragraph text"),
      tables = Vector(Vector(
        Vector("h1", "h2", "h3"),
        Vector("cell one", "cell two", "cell three"))))
    val out = Extract.extractBytes("rtf", RtfWriter.write(spec), Extract.Options())
    assert(out.content == RtfWriter.expectedText(spec), out.content)
    assert(out.content ==
      "intro paragraph text\nh1\th2\th3\ncell one\tcell two\tcell three\n")
    // plain documents unchanged
    val plain = RtfWriter.Spec("T", "A", Vector("only text"))
    assert(Extract.extractBytes("rtf", RtfWriter.write(plain),
      Extract.Options()).content == "only text\n")
  }

  test("E13+: ODT tables — one tab-joined line per row after the paragraphs") {
    import graft.corpus.OdtWriter
    val spec = OdtWriter.Spec("Tabled", "A",
      Vector("intro paragraph text"),
      tables = Vector(Vector(
        Vector("h1", "h2"),
        Vector("cell one", "cell two"))))
    val out = Extract.extractBytes("odt", OdtWriter.write(spec), Extract.Options())
    assert(out.content == OdtWriter.expectedText(spec), out.content)
    assert(out.content == "intro paragraph text\nh1\th2\ncell one\tcell two\n")
    // plain documents are unchanged
    val plain = OdtWriter.Spec("T", "A", Vector("only text"))
    assert(Extract.extractBytes("odt", OdtWriter.write(plain),
      Extract.Options()).content == "only text\n")
  }

  test("E10++: PPTX drawingml tables — tab-joined rows after the slide text") {
    import graft.corpus.PptxWriter
    val spec = PptxWriter.Spec("Deck", "A",
      Vector(Vector("slide one text"), Vector("slide two text")),
      slideTables = Vector(
        Vector(Vector("q1", "q2"), Vector("10", "20"))))
    val out = Extract.extractBytes("pptx", PptxWriter.write(spec), Extract.Options())
    assert(out.content == PptxWriter.expectedText(spec), out.content)
    assert(out.content == "slide one text\nq1\tq2\n10\t20\n\nslide two text")
  }

  test("E10+: PPTX speaker notes follow their slide as their own block") {
    import graft.corpus.PptxWriter
    val spec = PptxWriter.Spec("Deck", "A",
      Vector(Vector("slide one title", "slide one body"),
        Vector("slide two title"),
        Vector("slide three title")),
      notes = Vector("remember the demo", "", "closing remarks here"))
    val out = Extract.extractBytes("pptx", PptxWriter.write(spec), Extract.Options())
    assert(out.content == PptxWriter.expectedText(spec), out.content)
    assert(out.content ==
      "slide one title\nslide one body\n\nremember the demo\n\n" +
      "slide two title\n\nslide three title\n\nclosing remarks here")
    // noteless decks are byte-compatible with the old layout
    val plain = PptxWriter.Spec("Deck", "A", Vector(Vector("only slide")))
    assert(Extract.extractBytes("pptx", PptxWriter.write(plain),
      Extract.Options()).content == "only slide")
  }

  test("D1 zip64: EOCD64-routed OOXML classifies (CD offset behind the sentinel)") {
    import graft.corpus.{ArchiveWriter, DocxWriter}
    val docx = DocxWriter.write(DocxWriter.Spec("Zip64 Doc", "A",
      Vector("some paragraph text here"), pages = 1))
    val z64 = ArchiveWriter.toZip64(docx)
    assert(z64.length == docx.length + 56 + 20) // EOCD64 record + locator
    assert(Magic.sniff(z64) == Magic.Kind.Docx, "zip64 EOCD64 routing")
    // extraction still works (ZipInputStream walks local headers)
    val ext = Extract.extractBytes("docx", z64, Extract.Options())
    assert(ext.content.contains("some paragraph text here"))
    // a plain zip archive stays routable through the same rewrite
    val zip = ArchiveWriter.writeZip(Seq("a.txt" -> "zipped text".getBytes("UTF-8")))
    val zip64 = ArchiveWriter.toZip64(zip)
    assert(Magic.sniff(zip64) == Magic.Kind.Zip)
    assert(Extract.extractBytes("zip", zip64, Extract.Options())
      .content == "zipped text")
    // a truncated locator degrades to None routing, never throws
    Magic.sniff(z64.take(z64.length - 30))
  }

  test("D1: text subtyping by content hints (CSV/TSV/Markdown/XML/Python)") {
    def ct(s: String): String =
      Extract.extractText("txt", s, Extract.Options()).contentType
    assert(ct("col_a,col_b\n1,two\n3,four") == "text/csv; charset=UTF-8")
    assert(ct("a\tb\tc\n1\t2\t3\n4\t5\t6") == "text/tab-separated-values; charset=UTF-8")
    assert(ct("# Title\n\nSome prose here.\n\n- item one\n- item two\n")
      == "text/x-web-markdown; charset=UTF-8")
    assert(ct("#!/usr/bin/env python\nimport sys\nprint(1)")
      == "text/x-python; charset=UTF-8")
    // plain prose stays text/plain (no false positives)
    assert(ct("Just an ordinary paragraph, with one comma.\nAnd a second line here.")
      == "text/plain; charset=UTF-8")
    // XML extracts leaf text content
    val xml = Extract.extractText("txt",
      "<?xml version=\"1.0\"?>\n<r>\n  <a>Alpha</a>\n  <b>Beta</b>\n</r>",
      Extract.Options())
    assert(xml.contentType == "application/xml; charset=UTF-8")
    assert(xml.content == "Alpha\nBeta")
    // JSON and SVG refinements
    assert(ct("""{"a": 1, "b": ["x", "y"]}""") == "application/json; charset=UTF-8")
    val svg = Extract.extractText("txt",
      "<?xml version=\"1.0\"?><svg xmlns=\"x\"><title>T</title><text>Label Here</text></svg>",
      Extract.Options())
    assert(svg.contentType == "image/svg+xml; charset=UTF-8")
    assert(svg.content == "T\nLabel Here")
  }

  test("E7: unknown bytes -> empty content + octet-stream (spec/rika/parser_spec.rb:186-188,236-238)") {
    val out = Extract.extractBytes("bin", fixture("unknown.bin"), Extract.Options())
    assert(out.contentType == "application/octet-stream")
    assert(out.content == "")
    assert(out.issue.isEmpty)
  }

  test("failure taxonomy: empty payload flagged, not fatal (rika_command_spec.rb:147-160)") {
    val out = Extract.extractBytes("txt", Array.emptyByteArray, Extract.Options())
    assert(out.issue.contains(Extract.IssueEmptyFile))
    val out2 = Extract.extractBytes("txt", null, Extract.Options())
    assert(out2.issue.contains(Extract.IssueIoError))
  }

  // ---------------------------------------------------------------- html
  test("E2: HTML boilerplate stripped, main content kept") {
    val html =
      """<!DOCTYPE html><html><head><title>My Page</title>
        |<style>p { color: red }</style><script>var x = 1;</script></head>
        |<body><nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
        |<header><div>Site banner with enough words to look like text here</div></header>
        |<article><h1>The Article Headline</h1>
        |<p>This is the first real paragraph of the article body and it clearly
        |has enough words to be classified as main content by any reasonable rule.</p>
        |<p>A second substantial paragraph follows with more than ten words of
        |actual readable prose content for the extractor to keep.</p></article>
        |<div><a href="/x">link</a> <a href="/y">list</a> <a href="/z">of</a>
        |<a href="/w">links</a> <a href="/v">only</a> <a href="/u">navigation</a>
        |<a href="/t">items</a> <a href="/s">here</a> <a href="/r">all</a>
        |<a href="/q">boilerplate</a> <a href="/p">stuff</a></div>
        |<footer>Copyright 2026 Example Corp All rights reserved legal text</footer>
        |</body></html>""".stripMargin
    val out = Extract.extractText("html", html, Extract.Options())
    assert(out.contentType.startsWith("text/html"))
    assert(out.content.contains("first real paragraph"))
    assert(out.content.contains("The Article Headline"))
    assert(!out.content.contains("Home"))         // nav dropped
    assert(!out.content.contains("Copyright"))    // footer dropped
    assert(!out.content.contains("var x"))        // script dropped
    assert(!out.content.contains("color: red"))   // style dropped
    assert(!out.content.contains("Site banner"))  // header dropped
    assert(!out.content.contains("navigation"))   // link farm dropped
    assert(out.metadata("dc:title") == "My Page")
  }

  test("E2: full-text mode keeps boilerplate (reference/Tika semantics)") {
    val html = """<html><head><title>T</title></head><body>
      |<nav><a href="/">Home</a></nav>
      |<p>Main content paragraph with plenty of words to be kept as the body.</p>
      |<footer>Copyright footer text</footer></body></html>""".stripMargin
    val main = Extract.extractText("html", html, Extract.Options())
    val full = Extract.extractText("html", html, Extract.Options(htmlFullText = true))
    assert(!main.content.contains("Copyright"))
    assert(full.content.contains("Copyright"))
    assert(full.content.contains("Home"))
    assert(full.content.contains("Main content paragraph"))
  }

  test("E2+: HTML data tables — one tab-joined block per row, link rows still drop") {
    val html = """<html><body>
      <p>This paragraph has more than ten words of real main content in it.</p>
      <table>
        <tr><th>name</th><th>qty</th><th>price</th></tr>
        <tr><td>apples</td><td>3</td><td>2.40</td></tr>
        <tr><td>pears</td><td></td><td>1.10</td></tr>
      </table>
      <table><tr><td><a href="/a">one</a> <a href="/b">two</a></td><td><a href="/c">three</a></td></tr></table>
    </body></html>"""
    val r = HtmlKernel.extract(html)
    assert(r.blocks.contains("name\tqty\tprice"))
    assert(r.blocks.contains("apples\t3\t2.40"))
    assert(r.blocks.contains("pears\t\t1.10"), r.blocks) // interior empty keeps its slot
    assert(!r.blocks.exists(_.contains("one")), r.blocks) // all-links row fails density
    // nested block tags inside a cell stay ONE tab field
    val r2 = HtmlKernel.extract(
      "<body><table><tr><td><p>alpha</p><p>beta</p></td><td>x</td></tr></table></body>")
    assert(r2.blocks.contains("alpha beta\tx"), r2.blocks)
    // single-cell layout rows follow the normal word-count rules
    val r3 = HtmlKernel.extract(
      "<body><table><tr><td>tiny</td></tr></table></body>")
    assert(r3.blocks.isEmpty, r3.blocks)
    // full-text mode keeps everything, rows still tab-joined
    val ft = HtmlKernel.extractFullText(html)
    assert(ft.blocks.contains("apples\t3\t2.40"))
    assert(ft.blocks.contains("one two\tthree"), ft.blocks)
  }

  test("E2+: HTML lists — items after a content paragraph are kept, nav menus drop") {
    val html = """<html><body>
      <nav><ul><li><a href="/">home</a></li><li><a href="/x">about</a></li></ul></nav>
      <p>This intro paragraph has well over ten words of real main content text.</p>
      <ul><li>apples</li><li>pears and plums</li><li>late cherries</li></ul>
      <div class="tags"><ul><li><a href="/a">tag</a></li><li><a href="/b">tag</a></li></ul></div>
    </body></html>"""
    val r = HtmlKernel.extract(html)
    assert(r.blocks.contains("apples"), r.blocks)
    assert(r.blocks.contains("pears and plums"))
    assert(r.blocks.contains("late cherries"))
    // nav list items stay boilerplate; the trailing link list has no
    // preceding core block in ITS run... it does (the last kept li is
    // not core), and its items fail link density anyway
    assert(!r.blocks.exists(_.contains("home")), r.blocks)
    assert(!r.blocks.exists(_.contains("tag")), r.blocks)
    // a list with no content before it drops in main-content mode
    val lone = HtmlKernel.extract("<body><ul><li>alpha</li><li>beta</li></ul></body>")
    assert(lone.blocks.isEmpty, lone.blocks)
  }

  test("E2: entity decoding") {
    assert(HtmlKernel.decodeEntities("a &amp; b &lt;c&gt; &#65; &#x42;") == "a & b <c> A B")
  }

  // ------------------------------------------------------------- blocks
  test("blocksOf: blank-line split preserves trailing spaces") {
    val c = "line one   \nline two\n\npara two here"
    val b = Extract.blocksOf(c)
    assert(b == Vector("line one   \nline two", "para two here"))
  }
}

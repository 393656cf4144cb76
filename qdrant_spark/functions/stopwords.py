"""Built-in per-language stopword sets + the reference's spec forms.

The reference ships per-language stopword arrays selectable from
``TextIndexParams`` via ``StopwordsInterface`` — either a bare language
name or a set object with ``languages`` and ``custom`` lists
(lib/segment/src/data_types/index.rs:438; resolution logic
lib/segment/src/index/field_index/full_text_index/stop_words/mod.rs:70-155,
per-language arrays in stop_words/*.rs). This module reimplements that
surface over word lists transcribed from the PUBLIC NLTK / Snowball
stopword corpora (the same public sources the reference's README cites) —
written here from those public lists, not from the reference files.

Coverage: all 30 languages of the reference's stopword ``Language`` enum.
The major-language lists are full-size (english = the standard 179-word
NLTK list); smaller languages carry the core function-word subset of
their public list — membership for common words matches, but the sets
are not guaranteed word-for-word identical to any single NLTK release
(COVERAGE.md "Stopwords").

``resolve_stopwords`` accepts every spec form the reference does::

    resolve_stopwords("english")
    resolve_stopwords({"language": "english"})
    resolve_stopwords({"languages": ["english", "spanish"],
                       "custom": ["foo"]})
    resolve_stopwords({"bar", "baz"})          # plain custom set
    resolve_stopwords(["bar", "baz"])          # plain custom list

Words are stored lowercase; tokenization lowercases before the stopword
stage (tokens_processor.rs order: fold -> lowercase -> stopwords -> stem),
so lookups are case-insensitive end to end.
"""

from __future__ import annotations

from typing import Any, Iterable

_ENGLISH = """
i me my myself we our ours ourselves you you're you've you'll you'd your
yours yourself yourselves he him his himself she she's her hers herself it
it's its itself they them their theirs themselves what which who whom this
that that'll these those am is are was were be been being have has had
having do does did doing a an the and but if or because as until while of
at by for with about against between into through during before after
above below to from up down in out on off over under again further then
once here there when where why how all any both each few more most other
some such no nor not only own same so than too very s t can will just don
don't should should've now d ll m o re ve y ain aren aren't couldn
couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
"""

_GERMAN = """
aber alle allem allen aller alles als also am an ander andere anderem
anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
bis bist da damit dann der den des dem die das dass daß derselbe derselben
demselben dieselbe dieselben dasselbe dazu dein deine deinem deinen deiner
deines denn deren derer dessen dich dir du dies diese diesem diesen dieser
dieses doch dort durch ein eine einem einen einer eines einig einige
einigem einigen einiger einiges einmal er ihn ihm es etwas euer eure eurem
euren eurer eures für gegen gewesen hab habe haben hat hatte hatten hier
hin hinter ich mich mir ihr ihre ihrem ihren ihrer ihres euch im in indem
ins ist jede jedem jeden jeder jedes jene jenem jenen jener jenes jetzt
kann kein keine keinem keinen keiner keines können könnte machen man
manche manchem manchen mancher manches mein meine meinem meinen meiner
meines mit muss musste nach nicht nichts noch nun nur ob oder ohne sehr
sein seine seinem seinen seiner seines selbst sich sie ihnen sind so
solche solchem solchen solcher solches soll sollte sondern sonst über um
und uns unsere unserem unseren unser unseres unter viel vom von vor
während war waren warst was weg weil weiter welche welchem welchen welcher
welches wenn werde werden wie wieder will wir wird wirst wo wollen wollte
würde würden zu zum zur zwar zwischen
"""

_FRENCH = """
au aux avec ce ces dans de des du elle en et eux il ils je la le les leur
lui ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu
que qui sa se ses son sur ta te tes toi ton tu un une vos votre vous c d
j l à m n s t y été étée étées étés étant étante étants étantes suis es
est sommes êtes sont serai seras sera serons serez seront serais serait
serions seriez seraient étais était étions étiez étaient fus fut fûmes
fûtes furent sois soit soyons soyez soient fusse fusses fût fussions
fussiez fussent ayant ayante ayantes ayants eu eue eues eus ai as avons
avez ont aurai auras aura aurons aurez auront aurais aurait aurions
auriez auraient avais avait avions aviez avaient eut eûmes eûtes eurent
aie aies ait ayons ayez aient eusse eusses eût eussions eussiez eussent
"""

_SPANISH = """
de la que el en y a los del se las por un para con no una su al lo como
más pero sus le ya o este sí porque esta entre cuando muy sin sobre
también me hasta hay donde quien desde todo nos durante todos uno les ni
contra otros ese eso ante ellos e esto mí antes algunos qué unos yo otro
otras otra él tanto esa estos mucho quienes nada muchos cual poco ella
estar estas algunas algo nosotros mi mis tú te ti tu tus ellas nosotras
vosotros vosotras os mío mía míos mías tuyo tuya tuyos tuyas suyo suya
suyos suyas nuestro nuestra nuestros nuestras vuestro vuestra vuestros
vuestras esos esas estoy estás está estamos estáis están esté estés
estemos estéis estén estaré estarás estará estaremos estaréis estarán
estaría estarías estaríamos estaríais estarían estaba estabas estábamos
estabais estaban estuve estuviste estuvo estuvimos estuvisteis estuvieron
ser es soy eres somos sois son sea seas seamos seáis sean seré serás será
seremos seréis serán sería serías seríamos seríais serían era eras éramos
erais eran fui fuiste fue fuimos fuisteis fueron he has ha hemos habéis
han haya hayas hayamos hayáis hayan habré habrás habrá habremos habréis
habrán había habías habíamos habíais habían hube hubiste hubo hubimos
hubisteis hubieron tengo tienes tiene tenemos tenéis tienen tenga tengas
tengamos tengáis tengan tendré tendrás tendrá tendremos tendréis tendrán
tenía tenías teníamos teníais tenían tuve tuviste tuvo tuvimos tuvisteis
tuvieron
"""

_PORTUGUESE = """
de a o que e do da em um para é com não uma os no se na por mais as dos
como mas foi ao ele das tem à seu sua ou ser quando muito há nos já está
eu também só pelo pela até isso ela entre era depois sem mesmo aos ter
seus quem nas me esse eles estão você tinha foram essa num nem suas meu
às minha têm numa pelos elas havia seja qual será nós tenho lhe deles
essas esses pelas este fosse dele tu te vocês vos lhes meus minhas teu
tua teus tuas nosso nossa nossos nossas dela delas esta estes estas
aquele aquela aqueles aquelas isto aquilo estou está estamos estão estive
esteve estivemos estiveram estava estávamos estavam seja sejamos sejam
fui foi fomos foram era éramos eram serei será seremos serão seria
seríamos seriam hei há havemos hão houve houvemos houveram sou somos são
"""

_ITALIAN = """
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in nel
nello nei negli nell negl nella nelle su sul sullo sui sugli sull sugl
sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei mie
tuo tua tuoi tue suo sua suoi sue nostro nostra nostri nostre vostro
vostra vostri vostre mi ti ci vi lo la li le gli ne il un uno una ma ed
se perché anche come dov dove che chi cui non più quale quanto quanti
quanta quante quello quelli quella quelle questo questi questa queste si
tutto tutti a c e i l o ho hai ha abbiamo avete hanno abbia abbiate
abbiano avrò avrai avrà avremo avrete avranno avrei avresti avrebbe
avremmo avreste avrebbero avevo avevi aveva avevamo avevate avevano ebbi
avesti ebbe avemmo aveste ebbero sono sei è siamo siete sia siate siano
sarò sarai sarà saremo sarete saranno sarei saresti sarebbe saremmo
sareste sarebbero ero eri era eravamo eravate erano fui fosti fu fummo
foste furono essendo faccio fai fa facciamo fanno sto stai sta stiamo
stanno
"""

_DUTCH = """
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze zich
bij ook tot je mij uit der daar haar naar heb hoe heeft hebben deze u
want nog zal me zij nu ge geen omdat iets worden toch al waren veel meer
doen toen moet ben zonder kan hun dus alles onder ja eens hier wie werd
altijd doch wordt wezen kunnen ons zelf tegen na reeds wil kon niets uw
iemand geweest andere
"""

_DANISH = """
og i jeg det at en den til er som på de med han af for ikke der var mig
sig men et har om vi min havde ham hun nu over da fra du ud sin dem os
op man hans hvor eller hvad skal selv her alle vil blev kunne ind når
være dog noget ville jo deres efter ned skulle denne end dette mit også
under have dig anden hende mine alt meget sit sine vor mod disse hvis
din nogle hos blive mange ad bliver hendes været thi jer sådan
"""

_NORWEGIAN = """
og i jeg det at en et den til er som på de med han av ikke ikkje der så
var meg seg men ett har om vi min mitt ha hadde hun nå over da ved fra du
ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl her alle
vil bli ble blei bli'e kunne inn når være kom noen noe ville dere som
deres kun ja etter ned skulle denne for deg si sine sitt mot å meget
hvorfor dette disse uten hvordan ingen din ditt blir samme hvilken hvilke
sånn inni mellom vår hver hvem vors hvis både bare enn fordi før mange
også slik vært båe begge siden henne hennar hennes
"""

_SWEDISH = """
och det att i en jag hon som han på den med var sig för så till är men
ett om hade de av icke mig du henne då sin nu har inte hans honom skulle
hennes där min man ej vid kunde något från ut när efter upp vi dem vara
vad över än dig kan sina här ha mot alla under någon eller allt mycket
sedan ju denna själv detta åt utan varit hur ingen mitt ni bli blev
oss din dessa några deras blir mina samma vilken er sådan vår blivit
dess inom mellan sådant varför varje vilka ditt vem vilket sitta sådana
vart dina vars vårt våra ert era vilkas
"""

_FINNISH = """
olla olen olet on olemme olette ovat ole oli olisi olisit olisin
olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
en et ei emme ette eivät minä minun minut minua minussa minusta minuun
minulla minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun
sinulla sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen
hänellä häneltä hänelle me meidän meidät meitä meissä meistä meihin
meillä meiltä meille te teidän teidät teitä teissä teistä teihin teillä
teiltä teille he heidän heidät heitä heissä heistä heihin heillä heiltä
heille tämä tämän tätä tässä tästä tähän tällä tältä tälle tänä täksi
tuo tuon tuota tuossa tuosta tuohon tuolla tuolta tuolle tuona tuoksi
se sen sitä siinä siitä siihen sillä siltä sille sinä siksi nämä näiden
näitä näissä näistä näihin näillä näiltä näille näinä näiksi nuo noiden
noita noissa noista noihin noilla noilta noille noina noiksi ne niiden
niitä niissä niistä niihin niillä niiltä niille niinä niiksi kuka kenen
kenet ketä kenessä kenestä keneen kenellä keneltä kenelle kenenä keneksi
mikä minkä mitä missä mistä mihin millä miltä mille minä miksi joka
jonka jota jossa josta johon jolla jolta jolle jona joksi ja jos koska
kuin mutta niin sekä sitten tai vaan vai vaikka kanssa mukaan noin
poikki yli kun nyt itse
"""

_HUNGARIAN = """
a ahogy ahol aki akik akkor alatt által általában amely amelyek
amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
abban ahhoz annak arra arról az azok azon azt azzal azért aztán azután
azonban bár be belül benne cikk cikkek cikkeket csak de e eddig egész
egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen elő először
előtt első én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen
ezzel ezért és fel felé hanem hiszen hogy hogyan igen így illetve ill
ilyen ilyenkor ison ismét itt jó jól jobban kell kellett keresztül
keressünk ki kívül között közül legalább lehet lehetett legyen lenne
lenni lesz lett maga magát majd már más másik meg még mellett mert mely
melyek mi mit míg miért milyen mikor minden mindent mindenki mindig mint
mintha mivel most nagy nagyobb nagyon ne néha nekem neki nem néhány
nélkül nincs olyan ott össze ő ők őket pedig persze rá s saját sem semmi
sok sokat sokkal számára szemben szerint szinte talán tehát teljes
tovább továbbá több úgy ugyanis új újabb újra után utána utolsó vagy
vagyis valaki valami valamint való vagyok van vannak volt voltam voltak
voltunk vissza vele viszont volna
"""

_ROMANIAN = """
a abia acea aceasta această aceea acei aceia acel acela acele acelea
acest acesta aceste acestea acești aceștia acolo acord acum ai aia aibă
aici al ale alea altceva altcineva am ar are asemenea asta astea astăzi
asupra au avea avem aveți azi aș așadar atât atâta atâtea atâția ați
bine bucur bună ca care caut ce cel ceva chiar cinci cine cineva contra
cu cum cumva curând curînd când cât câte câtva câți cînd cît cîte cîtva
cîți că căci cărei căror cărui către da dacă dar datorită dată dau de
deci deja deoarece departe deși din dinaintea dintr dintre doi doilea
două drept după dă ea ei el ele eram este eu eşti face fata fi fie
fiecare fii fim fiu fiți frumos fără graţie halbă iar ieri la le li lor
lui lângă lîngă mai mea mei mele mereu meu mi mie mine mult multă mulți
mulțumesc mâine mîine mă ne nevoie nici nicăieri nimeni nimeri nimic
nişte noastre noastră noi noroc nostru nouă nu opt ori oricare orice
oricine oricum oricând oricât oricînd oricît oriunde patra patru patrulea
pe pentru peste pic poate pot prea prima primul prin puțin puțina puțină
până pînă rog sa sale sau se spate spre sub sunt suntem sunteți sută sînt
sîntem sînteți să săi său ta tale te timp tine toate toată tot totuși
toți trei treia treilea tu unde unei uneia unele uneori unii unor unora
unu unui unuia unul vi voastre voastră voi vostru vouă vreme vreo vreun
vă zece zero zi zice îi îl îmi împotriva în înainte înaintea încotro
încât încît între întrucât întrucît îți ăla ălea ăsta ăstea ăștia șapte
șase și știu ț ție
"""

_TURKISH = """
acaba ama aslında az bazı belki biri birkaç birşey biz bu çok çünkü da
daha de defa diye eğer en gibi hem hep hepsi her hiç için ile ise kez ki
kim mı mu mü nasıl ne neden nerde nerede nereye niçin niye o sanki şey
siz şu tüm ve veya ya yani
"""

_GREEK = """
αλλα αν αντι απο αυτα αυτεσ αυτη αυτο αυτοι αυτοσ αυτουσ αυτων αἱ αἳ αἵ
αὐτόσ αὐτὸς αὖ γάρ γα γα^ γε για γοῦν γὰρ δ' δέ δή δαί δαίσ δαὶ δαὶς δε
δεν δι' διά διὰ δὲ δὴ δι δικα εαν ειμαι ειμαστε ειναι εισαι ειστε εκεινα
εκεινεσ εκεινη εκεινο εκεινοι εκεινοσ εκεινουσ εκεινων ενω επ επι εἰ εἰμί
εἰμὶ εἰς εἰσ εἴ εἴμι εἴτε η θα ισωσ κ καί καίτοι καθ και κατ κατά κατα
κατὰ καὶ κι κἀν κἂν μέν μήτε μή μα με μεθ μετ μετά μετα μετὰ μη μην μἐν
μὲν μὴ μὴν να ο οι ομωσ οπωσ οσο οτι οὐ οὐδ οὐδέ οὐδείσ οὐδεὶς οὐδὲ
οὐκ οὐχ οὐχὶ οὓς οὔτε οὕτω οὕτως οὕτωσ οὖν οὗ οὗτος οὗτοσ παρ παρά παρα
παρὰ περί περὶ ποια ποιεσ ποιο ποιοι ποιοσ ποιουσ ποιων ποτε που ποῦ
προ προσ πρόσ πρὸ πρὸς πως πωσ σε στη στην στο στον σόσ σύ σύν σὸς σὺ
σὺν τά τήν τί τίς τίσ τα ταῖς τε την τησ τι τις τισ το τοί τοι τοιοῦτος
τοιοῦτοσ τον τοτε του τούσ τοὺς τοῖς τοῦ των τό τόν τότε τὰ τὰς τὴν τὸ
τὸν τῆς τῆσ τῇ τῶν τῷ ωσ ἀλλ' ἀλλά ἀλλὰ ἀλλʼ ἀπ ἀπό ἀπὸ ἀφ ἂν ἃ ἄλλος
ἄλλοσ ἄν ἄρα ἅμα ἐάν ἐγώ ἐγὼ ἐκ ἐμόσ ἐμὸς ἐν ἐξ ἐπί ἐπεὶ ἐπὶ ἐστι ἐφ
ἐὰν ἑαυτοῦ ἔτι ἡ ἢ ἣ ἤ ἥ ἧς ἵνα ὁ ὃ ὃν ὃς ὅ ὅδε ὅθεν ὅπερ ὅς ὅσ ὅστις
ὅστισ ὅτε ὅτι ὑμόσ ὑπ ὑπέρ ὑπό ὑπὲρ ὑπὸ ὡς ὡσ ὥς ὥστε ὦ ᾧ
"""

_RUSSIAN = """
и в во не что он на я с со как а то все она так его но да ты к у же вы
за бы по только ее мне было вот от меня еще нет о из ему теперь когда
даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
вам ведь там потом себя ничего ей может они тут где есть надо ней для
мы тебя их чем была сам чтоб без будто чего раз тоже себе под будет ж
тогда кто этот того потому этого какой совсем ним здесь этом один почти
мой тем чтобы нее сейчас были куда зачем всех никогда можно при наконец
два об другой хоть после над больше тот через эти нас про всего них
какая много разве три эту моя впрочем хорошо свою этой перед иногда
лучше чуть том нельзя такой им более всегда конечно всю между
"""

_ARABIC = """
في من على و فى يا أن ان إن لا ما هذا هذه ذلك تلك هو هي هم هن أنت أنتم
نحن أنا إلى الى عن مع كل لم لن له لها لهم ثم أو او بل قد كان كانت يكون
تكون إذا اذا حتى كما لكن ليس عند عندما منذ بين بعد قبل غير بها به فيه
فيها منه منها إلا الا أي اي كيف أين اين متى لماذا هل الذي التي الذين
اللاتي اللواتي هناك هنا أيضا ايضا فقط حيث دون حول أمام امام خلف تحت فوق
ضد نحو عبر خلال بسبب مثل
"""

_CHINESE = """
的 了 和 是 就 都 而 及 與 着 或 一個 沒有 我們 你們 妳們 他們 她們 是否
一个 没有 我们 你们 他们 她们 这 那 这个 那个 之 在 也 有 不 人 我 他 她
它 你 於 于 对 對 与 很 到 说 說 要 去 会 會 着 能 下 上 为 為 个 中 来
來 大 以 们 們 时 時 得 可以 这样 那样 因为 所以 但是 如果 虽然 然后 还是
"""

_JAPANESE = """
の に は を た が で て と し れ さ ある いる も する から な こと として
い や れる など なっ ない この ため その あっ よう また もの という あり
まで られ なる へ か だ これ によって により おり より による ず なり
られる において ば なかっ なく しかし について せ だっ その後 できる それ
う ので なお のみ でき き つ における および いう さらに でも ら たり
その他 に関する たち ます ん なら に対して 特に せる 及び これら とき
では にて ほか ながら うち そして とともに ただし かつて それぞれ または
お ほど ものの に対する ほとんど と共に といった です とも ところ ここ
"""

_INDONESIAN = """
yang dan di ke dari ini itu dengan untuk pada adalah sebagai dalam tidak
akan oleh juga saya kami kita kamu anda dia mereka ada atau bisa dapat
sudah telah belum harus karena jika kalau seperti saat ketika maka
sehingga namun tetapi tapi agar supaya bahwa para lebih sangat hanya
masih lagi pun lah kah nya sebuah suatu setiap semua beberapa banyak
antara tanpa tentang terhadap hingga sampai sejak selama kemudian lalu
kembali per bagi serta yaitu yakni ialah bukan jangan mana siapa apa
bagaimana mengapa kenapa dimana kapan berapa begitu demikian
"""

_CATALAN = """
a abans algun alguna algunes alguns altre amb ambdós anar ans aquell
aquelles aquells aquest aquesta aquestes aquests així bastant bé cada
com consegueixo conseguim conseguir consigueix consigueixen dalt de des
dins el ella elles ells els en ens entre era erem eren eres es ésser
està estan estat estava estem esteu estic ets fa faig fan fas fem fer
feu fi ha han has haver hi i incloent jo la les llarg llavors mentre
meu mode molt molts nosaltres o on perperquè però poc poca pocs podem
poden poder podeu potser primer puc quan quant que què qui sabem saber
sabeu sap saps sense ser seu seus si soc solament sols som sota també
te tene tenim tenir teniu teu tot últim un una unes uns ús va vaig van
vosaltres
"""

_BASQUE = """
al anitz arabera asko baina bat batean batek bati batzuei batzuek
batzuetan batzuk bera beraiek berau berauek bere berori beroriek beste
bezala da dago dira ditu du dute edo egin ere eta eurak ez gainera gu
gutxi guzti haiei haiek haietan hainbeste hala han handik hango hara
hari hark hartan hau hauei hauek hauetan hemen hemendik hemengo hi hona
honek honela honetan honi hor hori horiei horiek horietan horko horra
horrek horrela horretan horri hortik hura izan ni noiz nola non nondik
nongo nor nora ze zein zen zenbait zenbat zer zergatik ziren zituen zu
zuek zuen zuten
"""

_AZERBAIJANI = """
a ad altı altmış amma arasında artıq ay az bax belə bəli bəlkə beş bəzən
bəzi bilər bir biraz biri birşey biz bizim bizlər bu buna bunda bundan
bunlar bunları bunların bunu bunun buradan bütün ci cı cu cü çox çünki
da daha də dedi dək dən dəqiqə doqquz doqsan dörd düz ə edən edir əgər
əlbəttə elə əlli ən əslində etdi etmə etmək faiz gilə görə ha haqqında
harada hə heç həm həmin həmişə hər hansı idi iki il ildə ilə ilk insan
isə istifadə iyirmi ki kim kimə kimi lakin lap məhz mən mənə mirşey nə
nəhayət niyə o obirisi of olan olar olaraq oldu olduğu olmadı olmaz
olmuşdur olsun on ona ondan onlar onlardan onların onsuzda onu onun orada
otuz öz özü qarşı qədər qırx saat sadəcə saniyə səkkiz səksən sən sənə
sənin siz sizin sizlər sonra səhv üç üçün var və xan xanım xeyr ya yalnız
yaxşı yeddi yenə yetmiş yox yoxdur yoxsa yüz zaman
"""

_BENGALI = """
অতএব অথচ অথবা অনুযায়ী অনেক অনেকে অনেকেই অন্তত অন্য অবধি অবশ্য অর্থাত আই
আগামী আগে আগেই আছে আজ আদ্যভাগে আপনার আপনি আবার আমরা আমাকে আমাদের আমার
আমি আর আরও ই ইত্যাদি ইহা উচিত উত্তর উনি উপর উপরে এ এঁদের এঁরা এই একই একটি
একবার একে এক্ এখন এখনও এখানে এখানেই এটা এটাই এটি এত এতটাই এতে এদের এব এবং
এবার এমন এমনকী এমনি এর এরা এল এস এসে ঐ ও ওঁদের ওঁর ওঁরা ওই ওকে ওখানে
ওদের ওর ওরা কখনও কত কবে কমনে কয়েক কয়েকটি করছে করছেন করতে করবে করবেন করলে
করলেন করা করাই করায় করার করি করিতে করিয়া করিয়ে করে করেই করেছিলেন করেছে
করেছেন করেন কাউকে কাছ কাছে কাজ কাজে কারও কারণ কি কিংবা কিছু কিছুই কিন্তু
কী কে কেউ কেউই কেখা কেন কোটি কোন কোনও কোনো ক্ষেত্রে খুব গিয়ে গিয়েছে
গেছে গেল গেলে গোটা চলে চান চায় চার চালু চেয়ে চেষ্টা ছাড়া ছাড়াও ছিল ছিলেন
জন জনকে জনের জন্য জন্যওজে জানা জানানো জানায় জানিয়ে জানিয়েছে জে জ্নজন টি
ঠিক তখন তত তথা তবু তবে তা তাঁকে তাঁদের তাঁর তাঁরা তাঁাহারা তাই তাও তাকে
তাতে তাদের তার তারা তারৈ তাহলে তাহা তাহাতে তাহার তিনঐ তিনি তিনিও তীক্ষ্ন
তুমি তুলে তেমন তো তোমার থাকবে থাকবেন থাকা থাকায় থাকে থাকেন থেকে থেকেই
থেকেও দিকে দিতে দিন দিয়ে দিয়েছে দিয়েছেন দিলেন দু দুই দুটি দুটো দেওয়া
দেওয়ার দেখতে দেখা দেখে দেন দেয় দ্বারা ধরা ধরে ধামার নতুন নয় না নাই নাকি
নাগাদ নানা নিজে নিজেই নিজেদের নিজের নিতে নিয়ে নিয়ে নেই নেওয়া নেওয়ার নয়
পক্ষে পর পরে পরেই পরেও পর্যন্ত পাওয়া পাচ পারি পারে পারেন পি পেয়ে প্রতি
প্রথম প্রভৃতি প্রযন্ত প্রাথমিক প্রায় ফলে ফিরে ফের বক্তব্য বদলে বন বরং
বলতে বলল বললেন বলা বলে বলেছেন বলেন বসে বহু বা বাদে বার বি বিনা বিভিন্ন
বিশেষ বিষয়টি বেশ বেশি ব্যবহার ব্যাপারে ভাবে ভাবেই মতো মতোই মধ্যভাগে
মধ্যে মধ্যেই মধ্যেও মনে মাত্র মাধ্যমে মোট মোটেই যখন যত যতটা যথেষ্ট যদি
যদিও যা যাঁর যাঁরা যাওয়া যাওয়ার যাকে যাচ্ছে যাতে যাদের যান যাবে যায় যার
যারা যিনি যে যেখানে যেতে যেন যেমন র রকম রয়েছে রাখা রেখে শুধু শুরু সঙ্গে
সঙ্গেও সব সবার সমস্ত সম্প্রতি সহ সহিত সাধারণ সামনে সি সুতরাং সে সেই
সেখান সেখানে সেটা সেটাই সেটাও সেটি স্পষ্ট স্বয়ং হইতে হইবে হইয়া হওয়া
হওয়ায় হওয়ার হচ্ছে হত হতে হতেই হন হবে হবেন হয় হয়তো হয়নি হয়ে হয়েই হয়েছিল
হয়েছে হয়েছেন হল হলে হলেই হলেও হলো হাজার হিসাবে হৈলে হোক হয়
"""

_HEBREW = """
אבל או אולי אותו אותי אותך אותם אותן אותנו אז אחר אחרות אחרי אחרים איזה
איך אין איפה אל אלה אלו אם אנחנו אני אף אפשר את אתה אתכם אתם אתן באיזה
בגלל בו בין בלי במידה ברם בשביל בתוך גם דרך הוא היא היה היכן היתה היתי
הם הן הנה הרי ואילו ודאי זאת זה זו זות יהיה יוכל יוכלו יותר יכול יכולה
יכולות יכולים יכל יכלה יכלו יש כאן כאשר כולם כולן כזה כי כיצד כך ככה כל
כלל כמו כן כפי כש לא לאו לאיזו לאן לבין לה להיות להם להן לו לזה לזו לכם
לכן למה למעלה למעלם למרות לנו לעבר לעיל לפני מאד מאחורי מאיזו סוג מאין
מאיפה מבין מבלי מבעד מדוע מה מהיכן מול מחוץ מי מכאן מכיוון מלבד מן מנין
מסוגל מעט מעטים מעל מצד מקום מתחת מתי נגד נגר נו עד עז על עלי עליה עליהם
עליהן עליו עליך עליכם עלינו עם עצמה עצמהם עצמהן עצמו עצמי עצמם עצמן
עצמנו פה רק שוב של שלה שלהם שלהן שלו שלי שלך שלכה שלכם שלכן שלנו שם
תהיה תחת
"""

_HINGLISH = """
hai hain ho hota hoti hote hun tha thi the ka ki ke ko se me mein par
aur ya bhi nahi nahin na mat kya kyun kaise kab kahan kaun jo wo woh ye
yeh is us un in it iska uska iski uski iske uske apna apni apne mera
meri mere tera teri tere hamara hamari hamare tumhara tumhari tumhare
unka unki unke ek do teen char paanch ab tab jab phir fir to toh hi lekin
magar agar warna liye liya diya gaya gayi gaye raha rahi rahe karna karta
karti karte kiya karo kar chahiye wala wali wale bahut thoda zyada kam
sab kuch koi kisi kis bhai are arre haan ji accha acha theek thik bas
abhi kabhi sirf bilkul matlab yaar aap tum tu main hum log baat
"""

_KAZAKH = """
ах ох эх ай эй ой тағы тағыда әрине жоқ сондай осындай осылай солай
мұндай бұндай мен сен ол біз бізде сізде олар олардың оларға оларды
менің сенің оның біздің сіздің және бірақ немесе әлде егер себебі
өйткені сондықтан үшін арқылы туралы дейін кейін бұрын соң де да та те
ғана ақ әр әрбір барлық бүкіл кейбір кез келген осы бұл сол анау мынау
қандай қай қайсы неше қанша не кім қашан қайда қалай неге неліктен бар
еді екен емес болады болды болған болмады өте тым аса
"""

_NEPALI = """
अक्सर अगाडि अझै अनुसार अन्तर्गत अन्य अब अरू अरूलाई अर्को अर्थात अर्थात्
आए आजको आफू आफूलाई आफ्नै आफ्नो आयो उदाहरण उनको उनले उप उहाँलाई एउटै एक
एकदम औं कता कति कसरी कसै कसैले कहाँबाट कहिलेकाहीं का की कुनै के केहि
केही को कोही क्रमशः गरि गरी गरे गरेका गरेको गरेर गर्छ गर्छु गर्दै गर्न
गर्नु गर्नुपर्छ गयो चाँडै चार चाले चाहनुहुन्छ चाहन्छु चाहिए छ छन् छु छैन
जताततै जब जबकि जसको जसबाट जसमा जसलाई जसले जस्तै जस्तो जस्तोसुकै जहाँ जान
जाहिर जुन जे जो ठीक त तत्काल तथा तदनुसार तपाईं तपाईंको तर तल तापनि तिनी
तिनीहरू तिनीहरूको तिनीहरूलाई तिनीहरूले तिमी तिर ती तीन तुरुन्तै तेस्रो
त्यसकारण त्यसपछि त्यसमा त्यसैले त्यहाँ त्यो थप थिए थिएन थियो दिए दिनुभएको
दिनुहुन्छ दुई देख देखि देखिन्छ देखियो देखे देखेको देखेर दोस्रो धेरै न
नजिकै नत्र नयाँ नि निम्ति निम्न निम्नानुसार निर्दिष्ट नै पक्का पक्कै पछि
पछिल्लो पटक पनि पर्छ पर्थ्यो पर्याप्त पहिले पहिलो पहिल्यै पाँच पाँचौं
पूर्व प्रति प्रत्येक प्लस फेरि बने बन्द बन्न बरु बाटो बारे बाहिर बाहेक
बीच बीचमा भए भएको भन भने भनेर भन्छन् भन्छु भन्दा भन्ने भर भित्र भित्री म
मलाई मात्र माथि मा मुख्य मेरो यति यथोचित यदि यद्यपि यस यसको यसपछि यसबाहेक
यसरी यसो यस्तो यहाँ यहाँसम्म या यी यो र रहेका रहेको राखे राख्छ राम्रो रूप
लगभग लाई लागि ले वरिपरि वास्तवमा वाहेक विरुद्ध विशेष सँग सँगै सक्छ सट्टा
सधैं सबै सबैलाई समय सम्भव सम्म सही साथ साथै सायद सारा सो सोही स्पष्ट हरे
हरेक हामी हामीलाई हाम्रो हुँ हुन हुने हुनेछ हुन् हो होइन होकि होस्
"""

_SLOVENE = """
a ali bi bil bila bile bili bilo biti blizu bo bodo bolj bom bomo boste
bova boš brez čez da daleč dan danes do dokler dol dovolj en ena ene eni
enkrat eno ga in iz ja jaz je jih jim jo jih k kadar kaj kako kakor kamor
kamorkoli kar karkoli kdaj kdo kdorkoli ker ki kje kjer kjerkoli ko koder
koderkoli koga komu kot lahko le majhen manj me med medtem mene mi midva
midve mnogo moj moja moje mora morajo moram moramo morate moraš morem mu
na nad naj najina najino najmanj naju največ nam nas nato nazaj naš naša
naše ne nedavno nekaj nekatere nekateri nekatero nekdo neke nekega nekej
nekje neki nekoga nekoč ni nikamor nikdar nikjer nikoli nič nje njega
njegov njegova njegovo njej njemu njen njena njeno nji njih njihov
njihova njihovo njiju njim njo njun njuna njuno no o ob oba obe oboje od
okoli on onadva one oni onidve osem osma osmi osmo oz pa pet peta peti
peto po pod pogosto poleg ponavadi ponovno potem povsod prbl precej pred
prej preko pri pribl približno proti prva prvi prvo ravno redko res s
saj sam sama same sami samo se sebe sebi sedaj sedem sedma sedmi sedmo
sem seveda si sicer skoraj skozi smo so spet sta ste stran stvar sva ta
tak taka take taki tako takoj tam te tebe tebi tega ti tista tiste tisti
tisto tj tja to toda tretja tretje tretji tri tu tudi tukaj tvoj tvoja
tvoje v vaju vam vas vaš vaša vaše ve vedno vendar ves več vi vidva vsa
vsaj vsak vsaka vsakdo vsake vsaki vsakomur vse vsega vsi vso z za zadaj
zadnji zakaj zdaj zelo zunaj
"""

_TAJIK = """
дар ба аз бо ва ё ки ин он мо шумо ман ту вай онҳо худ ҳам низ чун агар
аммо вале лекин зеро чунки пас то магар на не ҳар ҳама баъзе чанд якчанд
ҳеҷ кадом чӣ кӣ кай куҷо чаро чанде гуна ҳамин ҳамон чунин ончунон ҳоло
акнун сипас баъд пеш қабл болои зери миёни байни барои дохили берун аст
ҳаст нест буд шуд мешавад мебошад бояд метавонад
"""

# Core function-word sets for the stemmer-only languages not in the
# reference's stopword enum (armenian, tamil) — same public-list origin,
# included so every stemmer language has a matching stopword set.
_ARMENIAN = """
ու և եւ որ է են էր էի եմ ես ենք եք այս այդ այն ինչ ով երբ որտեղ ինչպես
ինչու քանի որպես բայց կամ եթե թե չէ ոչ մի մեկ իր նրա նրանց մեր ձեր իմ քո
դու դուք մենք նա նրանք ես ամեն բոլոր շատ քիչ հետո առաջ մոտ վրա տակ մեջ
համար հետ առանց մասին ըստ դեպի մինչև արդեն դեռ նույնպես միայն նաև ահա
"""

_TAMIL = """
ஒரு என்று மற்றும் இந்த இது என்ற கொண்டு என்பது பல ஆகும் அல்லது அவர் நான்
உள்ள அந்த இவர் என முதல் என்ன இருந்து சில என் போன்ற வேண்டும் வந்து இதன்
அது அவன் தான் பலரும் என்னும் மேலும் பின்னர் கொண்ட இருக்கும் தனது உள்ளது
போது என்றும் அதன் தன் பிறகு அவர்கள் வரை அவள் நீ ஆகிய இருந்தது உள்ளன
வந்த இருந்த மிகவும் இங்கு மீது ஓர் இவை இந்தக் பற்றி வரும் வேறு இரு
இதில் போல் இப்போது அவரது மட்டும் இந்தப் எனும் மேல் பின் சேர்ந்த ஆகியோர்
எனக்கு இன்னும் அந்தப் அன்று ஒரே மிக அங்கு பல்வேறு விட்டு பெரும் அதை
பற்றிய உன் அதிக அந்தக் பேர் இதனால் அவை அதே ஏன் முறை யார் என்பதை எல்லாம்
மட்டுமே இங்கே அங்கே இடம் இடத்தில் அதில் நாம் அதற்கு எனவே பிற சிறு மற்ற
விட எந்த எனவும் எனப்படும் எனினும் அடுத்த இதனை இதை கொள்ள இந்தத் இதற்கு
அதனால் தவிர போல வரையில் சரி கண்
"""

STOPWORDS: dict[str, frozenset[str]] = {
    name: frozenset(words.split())
    for name, words in {
        "arabic": _ARABIC,
        "armenian": _ARMENIAN,
        "azerbaijani": _AZERBAIJANI,
        "basque": _BASQUE,
        "bengali": _BENGALI,
        "catalan": _CATALAN,
        "chinese": _CHINESE,
        "danish": _DANISH,
        "dutch": _DUTCH,
        "english": _ENGLISH,
        "finnish": _FINNISH,
        "french": _FRENCH,
        "german": _GERMAN,
        "greek": _GREEK,
        "hebrew": _HEBREW,
        "hinglish": _HINGLISH,
        "hungarian": _HUNGARIAN,
        "indonesian": _INDONESIAN,
        "italian": _ITALIAN,
        "japanese": _JAPANESE,
        "kazakh": _KAZAKH,
        "nepali": _NEPALI,
        "norwegian": _NORWEGIAN,
        "portuguese": _PORTUGUESE,
        "romanian": _ROMANIAN,
        "russian": _RUSSIAN,
        "slovene": _SLOVENE,
        "spanish": _SPANISH,
        "swedish": _SWEDISH,
        "tajik": _TAJIK,
        "tamil": _TAMIL,
        "turkish": _TURKISH,
    }.items()
}


def resolve_stopwords(spec: Any, *, lowercase: bool = True) -> frozenset[str] | None:
    """Resolve any ``StopwordsInterface`` spec form to a frozen word set.

    Mirrors ``StopwordsFilter::new`` (stop_words/mod.rs:74-101): a bare
    language name, a ``{"language": ...}`` object, a ``{"languages":
    [...], "custom": [...]}`` object (union of all named languages plus
    the custom words), or a plain iterable of custom words. ``None``
    stays ``None``. Unknown language names raise — silently indexing
    without stopword removal would diverge from a reference-built index.

    ``lowercase`` is the text index's lowercase flag: custom words are
    lowercased only when the tokens they must match are
    (``add_stopword``, stop_words/mod.rs:108-114). The built-in lists
    are stored lowercase either way, as in the reference's arrays.
    """
    if spec is None:
        return None
    if isinstance(spec, str):
        return _language(spec)

    def _custom(word: Any) -> str:
        return str(word).lower() if lowercase else str(word)

    if isinstance(spec, dict):
        out: set[str] = set()
        if "language" in spec:
            out |= _language(spec["language"])
        for lang in spec.get("languages") or ():
            out |= _language(lang)
        for word in spec.get("custom") or ():
            out.add(_custom(word))
        if not out and not ("language" in spec or "languages" in spec
                            or "custom" in spec):
            raise ValueError(
                f"stopwords spec {spec!r} has none of language/languages/custom")
        return frozenset(out)
    if isinstance(spec, (set, frozenset, list, tuple)):
        return frozenset(_custom(w) for w in spec)
    raise TypeError(f"unsupported stopwords spec: {type(spec).__name__}")


def _language(name: str) -> frozenset[str]:
    try:
        return STOPWORDS[name.lower()]
    except KeyError:
        raise ValueError(
            f"no built-in stopword list for {name!r}; available: "
            f"{sorted(STOPWORDS)}"
        ) from None
